#!/bin/bash -l
#
# Lossy+lossless compression of COLIBRE SOAP catalogues and membership
# files (counterpart of scripts/COLIBRE/compress_{halo_properties,
# group_membership}.sh).  Array index = snapshot number.
#
#   MODEL=thermal sbatch -J L0100N0752/Thermal --array=0-127 \
#       scripts/COLIBRE/compress.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/colibre_compress_%x.%a.%A.out
#SBATCH -t 01:00:00
#
set -e

snapnum=$(printf %04d "${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?}}")
sim="${SLURM_JOB_NAME:-${SIM_NAME:?}}"
soap_dir="${COLIBRE_OUTPUT:?}/${sim}/SOAP"

python -u -m soap_tpu compress \
    "${soap_dir}/halo_properties_${snapnum}.hdf5" \
    "${soap_dir}/halo_properties_${snapnum}.compressed.hdf5"

echo "Job complete!"
