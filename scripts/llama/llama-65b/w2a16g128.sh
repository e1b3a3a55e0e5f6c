python main.py \
--model /PATH/TO/llama/llama-65b --eval_ppl \
--output_dir ./log/llama-65b-w2a16g128 \
--epochs 20 --wbits 2 --abits 16 --group_size 128 --lwc
