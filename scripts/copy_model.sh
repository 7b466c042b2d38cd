#!/bin/bash
# Warm-start helper for RL fine-tuning: clone the XE run's checkpoint
# directory under a new id so tools/train.py --start_from picks it up.
#
#   bash scripts/copy_model.sh <src_id> <dst_id>
#
# Same contract as the reference script: no-op if log_<dst_id> exists;
# infos pickles are renamed to the new id (npz model/optimizer files are
# id-less and copy as-is).
set -e

src="log_$1"
dst="log_$2"
[ -d "$dst" ] && exit 0

cp -r "$src" "$dst"
for suffix in "-best" ""; do
  old="$dst/infos_$1$suffix.pkl"
  [ -f "$old" ] && mv "$old" "$dst/infos_$2$suffix.pkl"
done
exit 0
