#!/bin/bash -l
#
# Compress a finished catalogue with the SWIFT lossy filter pipelines +
# gzip, then verify it stays within filter tolerance of the original.
# Counterpart of the reference's compression/compress_fast_metadata.py
# batch scripts.
#
#   sbatch -J HYDRO_FIDUCIAL --array=0-77%8 scripts/FLAMINGO/compress.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=8
#SBATCH -o ./logs/compress_%x.%a.%A.out
#SBATCH -t 02:00:00
#
set -e

snapnum=$(printf %04d "${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?}}")
sim="${SLURM_JOB_NAME:-${SIM_NAME:?}}"

catalogue="${SOAP_OUTPUT:?}/${sim}/halo_properties_${snapnum}.hdf5"
compressed="${SOAP_OUTPUT}/${sim}/compressed/halo_properties_${snapnum}.hdf5"

python -m soap_tpu compress "$catalogue" "$compressed" --gzip-level=9
python -m soap_tpu compare "$catalogue" "$compressed"

echo "Job complete!"
