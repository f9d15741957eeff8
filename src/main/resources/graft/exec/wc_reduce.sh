#!/bin/bash
# Word-count reducer implementing the public Hadoop-streaming course-skeleton
# contract (reference: tests/testdata/exec/wc_reduce.sh): over the C-sorted
# "<key><TAB>1" stream, collapse consecutive equal keys to "<key><TAB><count>".
set -Eeuo pipefail
cut -f1 | uniq -c | awk '{print $2"\t"$1}'
