python main.py \
--model /PATH/TO/falcon/falcon-7b --eval_ppl \
--output_dir ./log/falcon-7b-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc
