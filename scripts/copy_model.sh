#!/bin/bash
# Clone log_$1 -> log_$2 renaming infos, for RL warm start
# (port of /root/reference/scripts/copy_model.sh)
if [ ! -d log_$2 ]; then
  cp -r log_$1 log_$2
  cd log_$2
  mv infos_$1-best.pkl infos_$2-best.pkl 2>/dev/null
  mv infos_$1.pkl infos_$2.pkl
  cd ..
fi
