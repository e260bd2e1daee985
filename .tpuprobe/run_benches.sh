#!/bin/bash
LOG=/root/repo/.tpuprobe/benches.log
echo "=== bench.py $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 1800 python3 /root/repo/bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== configs $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 2400 python3 -m benchmarks.configs >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== done $(date +%H:%M:%S) ===" >> $LOG
