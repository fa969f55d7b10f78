#!/bin/bash -l
#
# Multi-host halo properties over shared scratch: the TPU-native
# counterpart of the reference's 4-node / 40-node FLAMINGO runs
# (scripts/FLAMINGO/L1000N1800, L1000N3600).  Each Slurm task (= TPU
# host) processes its round-robin share of the Peano chunks and writes
# scratch files; the task that finds all chunks complete performs the
# combine.  Re-submitting after a failure resumes from scratch.
#
#   sbatch -J HYDRO_FIDUCIAL --array=0-77%2 --ntasks=4 \
#       scripts/FLAMINGO/halo_properties_multihost.sh
#
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/halo_properties_mh_%x.%a.%A.out
#SBATCH -t 12:00:00
#
set -e

snapnum=${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?}}
sim="L1000N1800/${SLURM_JOB_NAME:-${SIM_NAME:?}}"
chunks=${CHUNKS:-4}
scratch="${SCRATCH:?}/soap_tpu/${sim}/scratch_$(printf %04d "$snapnum")"

export SOAP_TPU_IO_PROCESSES=${SOAP_TPU_IO_PROCESSES:-8}
export SOAP_TPU_PREFETCH=1

dmo_flag=""
[[ $sim == *DMO_* ]] && dmo_flag="--dmo"

# --host-index/--host-count default to SLURM_PROCID/SLURM_NTASKS when
# omitted; on GCE TPU pod slices pass --host-index=$TPU_WORKER_ID
# --host-count=<workers> instead.
srun --kill-on-bad-exit=1 \
  python -u -m soap_tpu halo-properties parameter_files/FLAMINGO.yml \
    --sim-name="${sim}" --snap-nr="${snapnum}" \
    --chunks="${chunks}" --scratch-dir="${scratch}" ${dmo_flag}

echo "Job complete!"
