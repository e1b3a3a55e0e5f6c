python main.py \
--model /PATH/TO/Llama-2/Llama-2-70b --eval_ppl \
--output_dir ./log/Llama-2-70b-w4a16g128 \
--epochs 20 --wbits 4 --abits 16 --group_size 128 --lwc
