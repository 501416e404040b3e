#!/bin/bash
# Round-5 accuracy-run queue — the box has ONE CPU core, so the converged
# accuracy legs are serialized in VERDICT-priority order. Launched with
# setsid nohup so it survives session restarts; each leg logs under
# .acc_logs/ and the queue records a heartbeat in .acc_logs/queue.state.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p .acc_logs
state() { echo "$(date -u +%FT%TZ) $*" >> .acc_logs/queue.state; }

# ---- 1. wait for the running group_embed replicate-bug leg (VERDICT #1) ----
state "waiting for leg (b) pid $(cat /tmp/ge_bug.pid 2>/dev/null)"
while kill -0 "$(cat /tmp/ge_bug.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
state "leg (b) done"

# ---- 2. weight_sharing converged accuracy (VERDICT #4, second half) ----
state "starting weight_sharing"
python scripts/accuracy_parity.py --track weight_sharing --epochs 24 \
  --n-train 1024 --n-test 1024 --lr-step 10 --lr-gamma 0.3 --noise 0.02 \
  > .acc_logs/acc_ws.log 2>&1
state "weight_sharing done rc=$?"

# ---- 3. scanobjectnn noise calibration (VERDICT #6): jax side, short ----
# round-4 saturated at noise 0.04 (0.9995); find a sigma whose short-run
# plateau lands in a discriminative band before paying for the full 2-sided
# record. Calibration at reduced n_train reads slightly LOW vs the full run.
for nz in 0.35 0.25 0.18; do
  state "calib scanobjectnn noise=$nz"
  python scripts/accuracy_parity.py --track scanobjectnn --side jax \
    --epochs 8 --n-train 768 --n-test 512 --noise "$nz" \
    > ".acc_logs/calib_sonn_$nz.log" 2>&1
done
pick=0.25
for nz in 0.35 0.25 0.18; do
  oa=$(grep -o 'best OA [0-9.]*' ".acc_logs/calib_sonn_$nz.log" | tail -1 | awk '{print $3}')
  [ -z "$oa" ] && continue
  ok=$(python -c "print(1 if 0.78 <= $oa <= 0.94 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then pick=$nz; break; fi
done
state "scanobjectnn calibration picked noise=$pick"

# ---- 4. full de-saturated scanobjectnn record (both sides) ----
python scripts/accuracy_parity.py --track scanobjectnn --epochs 12 \
  --noise "$pick" > .acc_logs/acc_sonn_desat.log 2>&1
state "scanobjectnn desat done rc=$?"

# ---- 5. de-saturated partseg (VERDICT #6 'if cheap'; lowest priority) ----
python scripts/accuracy_parity.py --track partseg --epochs 12 --lr-step 4 \
  --n-train 1024 --n-test 512 --noise 0.08 \
  > .acc_logs/acc_partseg_desat.log 2>&1
state "partseg desat done rc=$?"
state "queue complete"
