#!/bin/bash
LOG=/root/repo/.tpuprobe/final3.log
echo "=== bench.py $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 1800 python3 /root/repo/bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== all configs $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 4200 python3 -m benchmarks.configs >> $LOG 2>&1
echo "rc=$? all done $(date +%H:%M:%S)" >> $LOG
