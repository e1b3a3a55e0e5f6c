python main.py \
--model /PATH/TO/opt/opt-13b --eval_ppl \
--output_dir ./log/opt-13b-w6a6 \
--epochs 20 --wbits 6 --abits 6 --lwc --let
