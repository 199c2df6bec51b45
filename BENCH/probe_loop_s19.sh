#!/bin/bash
# Session-19 probe-first scaling protocol (see BASELINE.md session-6 addendum):
# sample local[2] single-iteration throughput; the moment a probe lands
# in-band (>= 13,800 img/s trigger, slightly below the 14,085 band floor to
# allow for the single-iteration estimator reading low), immediately run the
# full same-window pair. All probes and the pair are logged under BENCH/.
cd /root/repo
TRIGGER=13800
for i in $(seq 1 24); do
  ts=$(date +%H%M%S)
  OLAKE_BENCH_N=1200000 OLAKE_BENCH_ITERS=1 python bench.py --cpus 2 \
    > "BENCH/probe_s19_${ts}.log" 2>&1
  rate=$(grep -o '"images_per_sec": [0-9.]*' "BENCH/probe_s19_${ts}.log" \
    | grep -o '[0-9.]*$')
  echo "$(date +%H:%M:%S) s19 probe $i rate=${rate:-FAILED}" >> BENCH/probe_auto_summary.log
  ok=$(python -c "print(1 if float('${rate:-0}') >= $TRIGGER else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) IN-BAND probe — launching full pair" >> BENCH/probe_auto_summary.log
    (while true; do echo "$(date +%H:%M:%S) $(cat /proc/loadavg)"; sleep 15; done \
      > BENCH/loadmon_r5s19.log 2>&1 &)
    OLAKE_BENCH_N=1200000 OLAKE_BENCH_ITERS=2 python bench.py --scaling --repeats 2 \
      > BENCH/scaling_r5s19.log 2>&1
    echo "$(date +%H:%M:%S) PAIR COMPLETE rc=$?" >> BENCH/probe_auto_summary.log
    break
  fi
  sleep 600
done
echo "$(date +%H:%M:%S) s19 probe loop exited" >> BENCH/probe_auto_summary.log
