python main.py \
--model /PATH/TO/falcon/falcon-180b --eval_ppl \
--output_dir ./log/falcon-180b-w2a16g64 \
--epochs 40 --wbits 2 --abits 16 --group_size 64 --lwc --aug_loss --nsamples 32
