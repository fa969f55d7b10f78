#!/bin/bash -l
#
# COLIBRE halo properties for one snapshot.  TPU-native counterpart of
# the reference's scripts/COLIBRE/halo_properties_{thermal,hybrid}.sh
# (mpirun -> one process per host; device parallelism is internal).
# Run the group_membership script first.
#
#   MODEL=thermal sbatch -J L0100N0752/Thermal --array=0-127 \
#       scripts/COLIBRE/halo_properties.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/colibre_properties_%x.%a.%A.out
#SBATCH -t 04:00:00
#
set -e

snapnum=${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?set SNAP_NR or run as array job}}
sim="${SLURM_JOB_NAME:-${SIM_NAME:?set SIM_NAME}}"
model="${MODEL:-thermal}"
case "$model" in
  thermal) params=parameter_files/COLIBRE_THERMAL.yml ;;
  hybrid)  params=parameter_files/COLIBRE_HYBRID.yml ;;
  *) echo "MODEL must be thermal or hybrid" >&2; exit 1 ;;
esac

export SOAP_TPU_IO_PROCESSES=${SOAP_TPU_IO_PROCESSES:-8}
export SOAP_TPU_PREFETCH=1

dmo_flag=""
[[ $sim == *DMO* ]] && dmo_flag="--dmo"

python -u -m soap_tpu halo-properties "$params" \
    --sim-name="${sim}" --snap-nr="${snapnum}" --chunks=1 ${dmo_flag}

echo "Job complete!"
