python main.py \
--model /PATH/TO/opt/opt-1.3b --eval_ppl \
--output_dir ./log/opt-1.3b-w2a16g64 \
--epochs 20 --wbits 2 --abits 16 --group_size 64 --lwc --let
