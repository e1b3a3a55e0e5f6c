python main.py \
--model /PATH/TO/falcon/falcon-7b --eval_ppl \
--output_dir ./log/falcon-7b-w2a16g64 \
--epochs 20 --wbits 2 --abits 16 --group_size 64 --lwc
