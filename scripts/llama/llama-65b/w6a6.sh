python main.py \
--model /PATH/TO/llama/llama-65b --eval_ppl \
--output_dir ./log/llama-65b-w6a6 \
--epochs 20 --wbits 6 --abits 6 --lwc --let --aug_loss
