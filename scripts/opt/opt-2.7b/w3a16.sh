python main.py \
--model /PATH/TO/opt/opt-2.7b --eval_ppl \
--output_dir ./log/opt-2.7b-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc --let
