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

# Golden-file acceptance gate (reference Makefile:26-27). Uses the in-tree
# py3 mirror of check/check.py (the upstream script is python2-only).
check:
	$(PYTHON) -m lbm_tpu.utils.checker \
		--ref-av-vels-file=$(REF_AV_VELS_FILE) \
		--ref-final-state-file=$(REF_FINAL_STATE_FILE) \
		--av-vels-file=av_vels.dat \
		--final-state-file=final_state.dat

test:
	$(PYTHON) -m pytest tests/ -x -q

bench:
	$(PYTHON) bench.py

plot:
	$(PYTHON) -m lbm_tpu.utils.viz final_state.dat final_state.png

clean:
	$(MAKE) -C native clean
	rm -f av_vels.dat final_state.dat final_state.png

.PHONY: all native run check test bench plot clean
