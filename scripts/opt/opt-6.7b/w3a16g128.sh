python main.py \
--model /PATH/TO/opt/opt-6.7b --eval_ppl \
--output_dir ./log/opt-6.7b-w3a16g128 \
--epochs 20 --wbits 3 --abits 16 --group_size 128 --lwc --let
