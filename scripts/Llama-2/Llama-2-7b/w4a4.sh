python main.py \
--model /PATH/TO/Llama-2/Llama-2-7b --eval_ppl \
--output_dir ./log/Llama-2-7b-w4a4 \
--epochs 20 --wbits 4 --abits 4 --lwc --let --aug_loss
