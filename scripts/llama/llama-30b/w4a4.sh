python main.py \
--model /PATH/TO/llama/llama-30b --eval_ppl \
--output_dir ./log/llama-30b-w4a4 \
--epochs 20 --wbits 4 --abits 4 --lwc --let --aug_loss
