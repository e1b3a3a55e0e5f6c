python main.py \
--model /PATH/TO/opt/opt-13b --eval_ppl \
--output_dir ./log/opt-13b-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc --let
