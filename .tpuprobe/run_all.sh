#!/bin/bash
LOG=/root/repo/.tpuprobe/final.log
echo "=== truetime $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 1800 python3 -u /root/repo/.tpuprobe/tpu_truetime.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench.py $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 1800 python3 /root/repo/bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== configs $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 3600 python3 -m benchmarks.configs >> $LOG 2>&1
echo "rc=$? all done $(date +%H:%M:%S)" >> $LOG
