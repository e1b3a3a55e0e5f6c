python main.py \
--model /PATH/TO/Llama-2/Llama-2-70b --eval_ppl \
--output_dir ./log/Llama-2-70b-w2a16 \
--epochs 20 --wbits 2 --abits 16 --lwc
