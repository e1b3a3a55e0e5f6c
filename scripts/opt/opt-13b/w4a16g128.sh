python main.py \
--model /PATH/TO/opt/opt-13b --eval_ppl \
--output_dir ./log/opt-13b-w4a16g128 \
--epochs 20 --wbits 4 --abits 16 --group_size 128 --lwc --let
