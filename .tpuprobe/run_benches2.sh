#!/bin/bash
LOG=/root/repo/.tpuprobe/benches2.log
echo "=== configs 2-5 $(date +%H:%M:%S) ===" >> $LOG
timeout -k 30 3000 python3 -m benchmarks.configs 2 3 4 5 >> $LOG 2>&1
echo "rc=$? done $(date +%H:%M:%S)" >> $LOG
