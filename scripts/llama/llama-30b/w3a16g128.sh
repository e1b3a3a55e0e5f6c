python main.py \
--model /PATH/TO/llama/llama-30b --eval_ppl \
--output_dir ./log/llama-30b-w3a16g128 \
--epochs 20 --wbits 3 --abits 16 --group_size 128 --lwc
