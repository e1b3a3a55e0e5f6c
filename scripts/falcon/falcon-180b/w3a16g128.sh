python main.py \
--model /PATH/TO/falcon/falcon-180b --eval_ppl \
--output_dir ./log/falcon-180b-w3a16g128 \
--epochs 40 --wbits 3 --abits 16 --group_size 128 --lwc --aug_loss --nsamples 32
