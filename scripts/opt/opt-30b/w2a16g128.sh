python main.py \
--model /PATH/TO/opt/opt-30b --eval_ppl \
--output_dir ./log/opt-30b-w2a16g128 \
--epochs 20 --wbits 2 --abits 16 --group_size 128 --lwc --let
