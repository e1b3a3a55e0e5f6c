python main.py \
--model /PATH/TO/llama/llama-30b --eval_ppl \
--output_dir ./log/llama-30b-w2a16g64 \
--epochs 20 --wbits 2 --abits 16 --group_size 64 --lwc
