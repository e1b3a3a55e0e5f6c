python main.py \
--model /PATH/TO/opt/opt-6.7b --eval_ppl \
--output_dir ./log/opt-6.7b-w4a16 \
--epochs 20 --wbits 4 --abits 16 --lwc --let
