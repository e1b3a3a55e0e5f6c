python main.py \
--model /PATH/TO/llama/llama-13b --eval_ppl \
--output_dir ./log/llama-13b-w2a16 \
--epochs 20 --wbits 2 --abits 16 --lwc
