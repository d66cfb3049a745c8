#!/bin/bash
# Round-3 TPU measurement sequence (run when the axon tunnel is healthy).
# Each step is its own process: a worker crash poisons all live buffers in
# a client, so never share a process across experiments.
set -x
cd /root/repo
mkdir -p /tmp/r3
timeout 1200 python experiments/gather_probe.py       > /tmp/r3/gather.log 2>&1
timeout 1800 python bench.py                          > /tmp/r3/bench_default.log 2>&1
POLS_TPU_ROW_EPILOGUE=1 timeout 1800 python bench.py  > /tmp/r3/bench_rowep.log 2>&1
timeout 3600 python benchmarks/suite.py --config grouped > /tmp/r3/suite_grouped.log 2>&1
timeout 3600 python benchmarks/suite.py --config large   > /tmp/r3/suite_large.log 2>&1
timeout 1800 python benchmarks/suite.py --config small   > /tmp/r3/suite_small.log 2>&1
timeout 3600 python benchmarks/suite.py --config grouped_largek > /tmp/r3/suite_grouped_largek.log 2>&1
tail -n +1 /tmp/r3/*.log
