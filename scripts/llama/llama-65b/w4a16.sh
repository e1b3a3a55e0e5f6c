python main.py \
--model /PATH/TO/llama/llama-65b --eval_ppl \
--output_dir ./log/llama-65b-w4a16 \
--epochs 20 --wbits 4 --abits 16 --lwc
