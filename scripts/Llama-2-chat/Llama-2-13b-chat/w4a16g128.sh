python main.py \
--model /PATH/TO/Llama-2-chat/Llama-2-13b-chat --eval_ppl \
--output_dir ./log/Llama-2-13b-chat-w4a16g128 \
--epochs 20 --wbits 4 --abits 16 --group_size 128 --lwc
