python main.py \
--model /PATH/TO/llama/llama-7b --eval_ppl \
--output_dir ./log/llama-7b-w4a4 \
--epochs 20 --wbits 4 --abits 4 --lwc --let --aug_loss
