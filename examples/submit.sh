#!/bin/bash
# SLURM array-job submission for replica fan-out (parity: reference
# submit.sh — one replica per array task; the driver picks up
# SLURM_ARRAY_TASK_ID automatically). On a TPU pod, prefer --vmap-replicas
# to batch replicas onto chips instead of one task per replica.
#SBATCH --job-name=cavmd
#SBATCH --array=0-499
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=1
#SBATCH --time=24:00:00

COUPLING=${1:-1e-3}

python -m cavmd_tpu.drivers.advanced_run \
    --molecular-bath bussi --cavity-bath langevin \
    --coupling "$COUPLING" --frequency 2000 --temperature 100 \
    --runtime 500 --enable-energy-tracker --enable-fkt
