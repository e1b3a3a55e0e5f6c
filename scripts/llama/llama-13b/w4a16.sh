python main.py \
--model /PATH/TO/llama/llama-13b --eval_ppl \
--output_dir ./log/llama-13b-w4a16 \
--epochs 20 --wbits 4 --abits 16 --lwc
