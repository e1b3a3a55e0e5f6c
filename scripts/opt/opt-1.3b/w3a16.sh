python main.py \
--model /PATH/TO/opt/opt-1.3b --eval_ppl \
--output_dir ./log/opt-1.3b-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc --let
