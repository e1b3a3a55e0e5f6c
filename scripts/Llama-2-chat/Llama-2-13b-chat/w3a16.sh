python main.py \
--model /PATH/TO/Llama-2-chat/Llama-2-13b-chat --eval_ppl \
--output_dir ./log/Llama-2-13b-chat-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc
