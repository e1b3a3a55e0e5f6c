python main.py \
--model /PATH/TO/Llama-2-chat/Llama-2-13b-chat --eval_ppl \
--output_dir ./log/Llama-2-13b-chat-w6a6 \
--epochs 20 --wbits 6 --abits 6 --lwc --let --aug_loss
