#!/bin/bash
# Round-4 TPU measurement sequence (run when the axon tunnel is healthy).
# Each step is its own process: a worker crash poisons all live buffers in
# a client, so never share a process across experiments.
set -x
cd /root/repo
mkdir -p /tmp/r4
timeout 3600 python benchmarks/suite.py --config grouped_largek > /tmp/r4/suite_grouped_largek.log 2>&1
timeout 3600 python benchmarks/suite.py --config large   > /tmp/r4/suite_large.log 2>&1
timeout 3600 python benchmarks/suite.py --config grouped > /tmp/r4/suite_grouped.log 2>&1
timeout 1800 python benchmarks/suite.py --config small   > /tmp/r4/suite_small.log 2>&1
timeout 1800 python bench.py                             > /tmp/r4/bench_default.log 2>&1
tail -n +1 /tmp/r4/*.log
