#!/bin/bash
for i in 1 2 3 4 5 6; do
  echo "=== attempt $i $(date +%H:%M:%S) ===" >> /root/repo/.tpuprobe/exact_retry.log
  timeout 900 python3 -u /root/repo/.tpuprobe/tpu_exact.py >> /root/repo/.tpuprobe/exact_retry.log 2>&1
  rc=$?
  echo "=== rc=$rc ===" >> /root/repo/.tpuprobe/exact_retry.log
  if grep -q DONE /root/repo/.tpuprobe/exact_retry.log; then break; fi
  sleep 180
done
