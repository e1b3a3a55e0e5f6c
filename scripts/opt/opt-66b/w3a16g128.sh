python main.py \
--model /PATH/TO/opt/opt-66b --eval_ppl \
--output_dir ./log/opt-66b-w3a16g128 \
--epochs 20 --wbits 3 --abits 16 --group_size 128 --lwc --let
