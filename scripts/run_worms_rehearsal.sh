#!/bin/bash
# BBBC010 2D protocol rehearsal (VERDICT r4 item 9): train -> predict ->
# decode -> label -> evaluate via the CLI on synthetic worms at dataset
# resolution (data/synth_worms, scripts/make_synthetic_worms.py).
# Run SOLO on the real chip:  bash scripts/run_worms_rehearsal.sh
set -ex
cd "$(dirname "$0")/.."

EXP=${EXP:-worms_rehearsal}
CKPT=${CKPT:-6000}

python -m patchperpix_tpu.cli -c configs/bbbc010_rehearsal.toml \
    --root experiments_out -id "$EXP" -d train
python -m patchperpix_tpu.cli --run_from_exp --root experiments_out \
    -id "$EXP" -d predict decode label evaluate \
    --mode test --checkpoint "$CKPT"
echo "REHEARSAL DONE"
ls experiments_out/"$EXP"/test/evaluated/"$CKPT"/ || true
