#!/bin/bash
# Poll the CPU canary; run bench.py only when the host reads quiet
# (py_loop and blas both under the thresholds). Collects up to $1 runs
# (default 3) into /tmp/bench_quiet_N.json. Session tooling for the r21
# optimization round's closing-number protocol.
cd /root/repo
runs=${1:-3}
i=0
while [ $i -lt $runs ]; do
  c=$(python scripts/canary.py 2>/dev/null)
  py=$(echo "$c" | python -c "import json,sys; print(json.load(sys.stdin)['py_loop_sec'])")
  bl=$(echo "$c" | python -c "import json,sys; print(json.load(sys.stdin)['blas_matmul_sec'])")
  ok=$(python -c "print(1 if float('$py') < 0.145 and float('$bl') < 0.035 else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) quiet (py=$py blas=$bl) -> bench run $i"
    python bench.py 2>/dev/null | tail -1 > /tmp/bench_quiet_$i.json
    tail -c 400 /tmp/bench_quiet_$i.json; echo
    i=$((i+1))
    sleep 20
  else
    echo "$(date +%H:%M:%S) dirty (py=$py blas=$bl), waiting"
    sleep 45
  fi
done
