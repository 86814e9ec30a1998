# Harness parity with the reference Makefile (reference Makefile:1-32):
# build + run + golden-file check, adapted to the TPU framework.

PYTHON ?= python

# Config selects the input pair and golden files, e.g. `make check SIZE=128x256`.
SIZE ?= 128x128
INPUT_DIR ?= /root/reference
PARAMS = $(INPUT_DIR)/input_$(SIZE).params
OBSTACLES = $(INPUT_DIR)/obstacles_$(SIZE).dat
REF_AV_VELS_FILE ?= $(INPUT_DIR)/check/$(SIZE).av_vels.dat
REF_FINAL_STATE_FILE ?= $(INPUT_DIR)/check/$(SIZE).final_state.dat

all: native

# The native C++ IO layer (optional fast path; Python fallback is identical).
native:
	$(MAKE) -C native

run:
	$(PYTHON) -m lbm_tpu $(PARAMS) $(OBSTACLES)

# Golden-file acceptance gate (reference Makefile:26-27). The upstream
# check/check.py is python2-only (check.py:6-10): when a python2 with numpy
# is available, the UNMODIFIED upstream script is the gate (the literal
# acceptance contract); otherwise we fall back — loudly — to the in-tree
# py3 mirror, which is byte-differentially tested against canned upstream
# transcripts (tests/test_checker_transcript.py). No python2 exists on
# this mount and zero egress blocks vendoring one, so the fallback is the
# only executable gate here.
UPSTREAM_CHECK ?= $(INPUT_DIR)/check/check.py
check:
	@if python2 -c 'import numpy' >/dev/null 2>&1; then \
		echo "== golden gate: UPSTREAM check.py (python2) =="; \
		python2 $(UPSTREAM_CHECK) \
			--ref-av-vels-file=$(REF_AV_VELS_FILE) \
			--ref-final-state-file=$(REF_FINAL_STATE_FILE) \
			--av-vels-file=av_vels.dat \
			--final-state-file=final_state.dat; \
	else \
		echo "== golden gate: py3 MIRROR (no python2+numpy found;" \
		     "upstream check.py is the acceptance contract — the mirror" \
		     "is transcript-differentially tested against it) =="; \
		$(PYTHON) -m lbm_tpu.utils.checker \
			--ref-av-vels-file=$(REF_AV_VELS_FILE) \
			--ref-final-state-file=$(REF_FINAL_STATE_FILE) \
			--av-vels-file=av_vels.dat \
			--final-state-file=final_state.dat; \
	fi

test:
	$(PYTHON) -m pytest tests/ -x -q

bench:
	$(PYTHON) bench.py

# Weak-scaling sweep. On this mount (one chip) it validates the protocol
# on a virtual 8-device CPU mesh; on a pod run `python bench_scaling.py
# 1024 --out scaling_pod.json` instead (BENCHMARKS.md runbook).
scaling:
	$(PYTHON) bench_scaling.py --cpu-mesh --out scaling_cpu.json

plot:
	$(PYTHON) -m lbm_tpu.utils.viz final_state.dat final_state.png

clean:
	$(MAKE) -C native clean
	rm -f av_vels.dat final_state.dat final_state.png

.PHONY: all native run check test bench scaling plot clean
