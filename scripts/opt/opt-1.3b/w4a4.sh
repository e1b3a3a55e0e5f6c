python main.py \
--model /PATH/TO/opt/opt-1.3b --eval_ppl \
--output_dir ./log/opt-1.3b-w4a4 \
--epochs 20 --wbits 4 --abits 4 --lwc --let
