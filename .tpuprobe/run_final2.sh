#!/bin/bash
LOG=/root/repo/.tpuprobe/final2.log
echo "=== bench.py $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 1800 python3 /root/repo/bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== config 4 5 $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 3000 python3 -m benchmarks.configs 4 5 >> $LOG 2>&1
echo "rc=$? all done $(date +%H:%M:%S)" >> $LOG
