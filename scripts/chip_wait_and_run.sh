#!/bin/bash
# Patiently wait for the wedged TPU claim to recover, then run the round-4
# hardware runbook. Each probe may block ~25 min before failing UNAVAILABLE
# (observed wedge signature); NEVER kill a probe — killed probes re-wedge
# the remote handshake. Logs to /tmp/rb/chip_wait.log.
set -u
cd /root/repo
mkdir -p /tmp/rb
LOG=/tmp/rb/chip_wait.log
echo "$(date -u +%FT%TZ) chip wait loop starting" >> "$LOG"

for attempt in $(seq 1 40); do
  echo "$(date -u +%FT%TZ) probe attempt $attempt" >> "$LOG"
  python - <<'EOF' >> "$LOG" 2>&1
import json, time
t0 = time.time()
try:
    import jax, jax.numpy as jnp
    x = jnp.ones((256, 256))
    s = float((x @ x).sum())
    print(json.dumps({"ok": True, "sum": s, "secs": round(time.time()-t0, 1)}))
except Exception as e:
    print(json.dumps({"ok": False, "error": str(e)[:200],
                      "secs": round(time.time()-t0, 1)}))
    raise SystemExit(1)
EOF
  if [ $? -eq 0 ]; then
    echo "$(date -u +%FT%TZ) chip recovered on attempt $attempt — runbook" >> "$LOG"
    bash scripts/runbook_r4.sh >> "$LOG" 2>&1
    echo "$(date -u +%FT%TZ) runbook finished rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 300
done
echo "$(date -u +%FT%TZ) gave up after 40 attempts" >> "$LOG"
exit 1
