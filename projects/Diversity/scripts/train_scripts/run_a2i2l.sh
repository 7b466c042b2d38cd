#!/bin/sh
# Diversity-paper sweep driver, translated to the TPU framework CLI
# (reference: projects/Diversity/scripts/train_scripts/ - same
# hyperparameters; train.py -> tools/train.py, .pth -> .npz).
# The reference's --structure_sample_n maps to --train_sample_n here
# (the flag that controls RL sample count in both codebases).
id="a2i2l"
ckpt_path="log_$id"
mkdir -p "$ckpt_path"
if [ -f "$ckpt_path/infos_$id.pkl" ]; then start_from="--start_from $ckpt_path"; else start_from=""; fi
python tools/train.py --id $id --caption_model att2in2 --input_json data/cocotalk.json --input_label_h5 data/cocotalk_label.h5 --input_fc_dir data/cocobu_fc --input_att_dir data/cocobu_att --seq_per_img 5 --batch_size 50 --rnn_size 2048 --beam_size 1 --learning_rate 5e-4 --learning_rate_decay_start 0 --scheduled_sampling_start 0 --checkpoint_path $ckpt_path $start_from --save_checkpoint_every 3000 --language_eval 1 --val_images_use 5000 --max_epochs 30 $EXTRA_TRAIN_ARGS
