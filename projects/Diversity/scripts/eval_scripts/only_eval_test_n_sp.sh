#!/bin/sh
# Diversity-paper eval driver, translated to the TPU framework CLI
# (reference: projects/Diversity/scripts/eval_scripts/ - same sampling
# settings; eval.py -> tools/eval.py, .pth -> .npz).  Set IMAGE_ROOT to
# your COCO images dir when dumping images.
id=$1
python tools/eval.py --image_root ${IMAGE_ROOT:-data/coco_images} --batch_size 100 --dump_images 0 --num_images -1 --split test --model log_$id/model-best.npz --only_lang_eval 1 --language_eval 1 --beam_size 5 --sample_n $3 --temperature $2 --sample_method greedy --sample_n_method sample --infos_path log_$id/infos_$id-best.pkl --id $4$id"_sp_"$2_$3 $EXTRA_EVAL_ARGS
