#!/bin/bash -l
#
# COLIBRE group membership for one snapshot (run before
# halo_properties).  TPU-native counterpart of the reference's
# scripts/COLIBRE/group_membership_{thermal,hybrid}.sh: one process per
# host, no MPI launcher.  MODEL selects the parameter file
# (thermal -> COLIBRE_THERMAL.yml, hybrid -> COLIBRE_HYBRID.yml).
#
#   mkdir -p logs
#   MODEL=thermal sbatch -J L0100N0752/Thermal --array=0-127 \
#       scripts/COLIBRE/group_membership.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/colibre_membership_%x.%a.%A.out
#SBATCH -t 0:30:00
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

python -u -m soap_tpu membership "$params" \
    --sim-name="${sim}" --snap-nr="${snapnum}"

echo "Job complete!"
