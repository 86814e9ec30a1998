# Environment setup for lbm_tpu (the reference's env.sh analogue).
# On a TPU VM nothing is usually needed — jax discovers local chips.
# For multi-host pods, set the usual JAX distributed variables before
# running, e.g.:
#   export JAX_COORDINATOR_ADDRESS=<host0>:8476
#   export JAX_NUM_PROCESSES=<n> JAX_PROCESS_ID=<i>
# Device override (the reference's OCL_DEVICE analogue):
#   export LBM_DEVICE=0
