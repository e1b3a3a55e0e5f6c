python main.py \
--model /PATH/TO/llama/llama-13b --eval_ppl \
--output_dir ./log/llama-13b-w6a6 \
--epochs 20 --wbits 6 --abits 6 --lwc --let --aug_loss
