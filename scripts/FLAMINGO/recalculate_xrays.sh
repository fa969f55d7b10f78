#!/bin/bash -l
#
# Per-particle X-ray luminosities from the FLAMINGO emissivity tables,
# written as an extra-input file the pipeline reads alongside the
# snapshot.  Counterpart of the reference's misc/recalculate_xrays.py
# MPI run; here the interpolation is one fused device program.
#
#   sbatch -J HYDRO_FIDUCIAL --array=0-77%4 scripts/FLAMINGO/recalculate_xrays.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/xray_%x.%a.%A.out
#SBATCH -t 01:00:00
#
set -e

snapnum=$(printf %04d "${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?}}")
sim="L1000N0900/${SLURM_JOB_NAME:-${SIM_NAME:?}}"

snapshot="${FLAMINGO_DATA:?}/Runs/${sim}/snapshots/flamingo_${snapnum}/flamingo_${snapnum}.{file_nr}.hdf5"
xray_out="${SCRATCH:?}/flamingo/Runs/${sim}/xray/xray_${snapnum}.hdf5"
xray_table="${FLAMINGO_DATA}/Tables/Xray/X_Ray_table_metals_full.hdf5"

python -u -m soap_tpu recalculate-xrays "$snapshot" "$xray_table" "$xray_out"

echo "Job complete!"
