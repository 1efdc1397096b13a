#!/bin/bash
# ISBI 2012 protocol rehearsal (round-5): train -> predict -> label ->
# evaluate via the CLI on synthetic dense EM at dataset resolution
# (data/synth_isbi, scripts/make_synthetic_isbi.py).
# Run SOLO on the real chip:  bash scripts/run_isbi_rehearsal.sh
set -ex
cd "$(dirname "$0")/.."

EXP=${EXP:-isbi_rehearsal}
CKPT=${CKPT:-6000}

python -m patchperpix_tpu.cli -c configs/isbi_rehearsal.toml \
    --root experiments_out -id "$EXP" -d train
python -m patchperpix_tpu.cli --run_from_exp --root experiments_out \
    -id "$EXP" -d predict label evaluate \
    --mode test --checkpoint "$CKPT"
echo "REHEARSAL DONE"
ls experiments_out/"$EXP"/test/evaluated/"$CKPT"/ || true
