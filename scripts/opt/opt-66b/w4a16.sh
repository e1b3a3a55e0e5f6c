python main.py \
--model /PATH/TO/opt/opt-66b --eval_ppl \
--output_dir ./log/opt-66b-w4a16 \
--epochs 20 --wbits 4 --abits 16 --lwc --let
