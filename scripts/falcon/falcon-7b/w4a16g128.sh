python main.py \
--model /PATH/TO/falcon/falcon-7b --eval_ppl \
--output_dir ./log/falcon-7b-w4a16g128 \
--epochs 20 --wbits 4 --abits 16 --group_size 128 --lwc
