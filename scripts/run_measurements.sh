#!/bin/sh
# Round-10 measurement battery (VERDICT r4 items 2, 3, 8): run on an
# IDLE host with a healthy relay (probe first — CLAUDE.md). Each step
# appends to /tmp/meas/<name>.log; rerunning skips completed steps.
set -u
OUT=${MEAS_OUT:-/tmp/meas}
mkdir -p "$OUT"

step() {
    name=$1; shift
    if [ -f "$OUT/$name.ok" ]; then
        echo "== $name: already done, skipping"
        return 0
    fi
    echo "== $name: $(date +%H:%M:%S)"
    if "$@" > "$OUT/$name.log" 2>&1; then
        touch "$OUT/$name.ok"
        echo "   ok"
    else
        echo "   FAILED (see $OUT/$name.log)"
    fi
}

cd "$(dirname "$0")/.."

# 0. bounded relay probe (120 s); abort the battery if wedged
if ! timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))"; then
    echo "relay probe hung/failed — NOT running measurements"
    exit 1
fi

# 1. fused-xent isolated A/B (item 2)
step fused_xent_profile timeout 2400 python scripts/profile_fused_xent.py

# 2. end-to-end train A/B. The round-10 A/B flipped the product
# default to UNFUSED, so the fused arm now opts in explicitly —
# plain `bench.py --train` measures the shipped (unfused) default.
step train_rnn_fused env NM_FUSED_XENT=1 timeout 2400 python bench.py --train
step train_rnn_unfused timeout 2400 python bench.py --train
step train_tr_fused env NM_FUSED_XENT=1 timeout 2400 python bench.py --train --model=transformer
step train_tr_unfused timeout 2400 python bench.py --train --model=transformer

# 3. train-step anatomy re-ablation (item 8)
step anatomy_transformer timeout 2400 python scripts/profile_ttrain.py
step anatomy_rnn timeout 2400 python scripts/profile_ttrain.py rnn

# 4. serving micro-batch throughput (item 3)
step serve_concurrent timeout 3600 python bench.py --serve --concurrent

# 5. full default artifact (validates new extras on the real chip)
step bench_default timeout 7200 python bench.py

echo "battery complete: $(ls "$OUT"/*.ok 2>/dev/null | wc -l) steps ok"
