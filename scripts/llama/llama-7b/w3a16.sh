python main.py \
--model /PATH/TO/llama/llama-7b --eval_ppl \
--output_dir ./log/llama-7b-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc
