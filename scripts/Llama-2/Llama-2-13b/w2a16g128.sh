python main.py \
--model /PATH/TO/Llama-2/Llama-2-13b --eval_ppl \
--output_dir ./log/Llama-2-13b-w2a16g128 \
--epochs 20 --wbits 2 --abits 16 --group_size 128 --lwc
