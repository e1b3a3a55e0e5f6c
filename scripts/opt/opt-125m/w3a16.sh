python main.py \
--model /PATH/TO/opt/opt-125m --eval_ppl \
--output_dir ./log/opt-125m-w3a16 \
--epochs 20 --wbits 3 --abits 16 --lwc --let
