python main.py \
--model /PATH/TO/Llama-2-chat/Llama-2-7b-chat --eval_ppl \
--output_dir ./log/Llama-2-7b-chat-w2a16 \
--epochs 20 --wbits 2 --abits 16 --lwc
