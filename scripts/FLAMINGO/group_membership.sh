#!/bin/bash -l
#
# Compute group membership files for a snapshot (run before
# halo_properties).  Counterpart of the reference's
# group_membership_L1000N0900.sh — one process per host, device
# sort-join instead of an MPI parallel sort.
#
#   sbatch -J HYDRO_FIDUCIAL --array=0-77%4 scripts/FLAMINGO/group_membership.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/group_membership_%x.%a.%A.out
#SBATCH -t 0:30:00
#
set -e

snapnum=${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?}}
sim="L1000N0900/${SLURM_JOB_NAME:-${SIM_NAME:?}}"

python -u -m soap_tpu membership parameter_files/FLAMINGO.yml \
    --sim-name="${sim}" --snap-nr="${snapnum}"

echo "Job complete!"
