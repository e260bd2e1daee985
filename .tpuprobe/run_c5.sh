#!/bin/bash
timeout -k 30 2400 python3 -m benchmarks.configs 5 > /root/repo/.tpuprobe/c5b.log 2>&1
echo "rc=$?" >> /root/repo/.tpuprobe/c5b.log
