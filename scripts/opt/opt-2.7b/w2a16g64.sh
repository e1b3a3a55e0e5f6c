python main.py \
--model /PATH/TO/opt/opt-2.7b --eval_ppl \
--output_dir ./log/opt-2.7b-w2a16g64 \
--epochs 20 --wbits 2 --abits 16 --group_size 64 --lwc --let
