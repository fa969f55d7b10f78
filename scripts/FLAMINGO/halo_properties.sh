#!/bin/bash -l
#
# Compute halo properties for a snapshot on ONE TPU host.  Run the
# group_membership script first.  TPU-native counterpart of the
# reference's scripts/FLAMINGO/L1000N0900/halo_properties_L1000N0900.sh:
# no MPI launcher — one process drives the whole host; device
# parallelism is internal (bucketed vmapped programs on the chip mesh).
#
# Job name selects the run; the array index is the snapshot number:
#
#   mkdir -p logs
#   sbatch -J HYDRO_FIDUCIAL --array=0-77%4 scripts/FLAMINGO/halo_properties.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/halo_properties_%x.%a.%A.out
#SBATCH -t 04:00:00
#
set -e

snapnum=${SLURM_ARRAY_TASK_ID:-${SNAP_NR:?set SNAP_NR or run as array job}}
sim="L1000N0900/${SLURM_JOB_NAME:-${SIM_NAME:?set SIM_NAME}}"

# host-side knobs: parallel HDF5 segment readers + background prefetch
export SOAP_TPU_IO_PROCESSES=${SOAP_TPU_IO_PROCESSES:-8}
export SOAP_TPU_PREFETCH=1

dmo_flag=""
if [[ $sim == *DMO_* ]] ; then
  dmo_flag="--dmo"
else
  # hydro runs need the per-particle X-ray extra input (see
  # recalculate_xrays.sh for a standalone version)
  snapshot="${FLAMINGO_DATA:?}/Runs/${sim}/snapshots/flamingo_{snap_nr:04}/flamingo_{snap_nr:04}.{file_nr}.hdf5"
  xray_out="${SCRATCH:?}/flamingo/Runs/${sim}/xray/xray_{snap_nr:04}.hdf5"
  xray_table="${FLAMINGO_DATA}/Tables/Xray/X_Ray_table_metals_full.hdf5"
  python -m soap_tpu recalculate-xrays \
      "${snapshot//\{snap_nr:04\}/$(printf %04d "$snapnum")}" \
      "$xray_table" \
      "${xray_out//\{snap_nr:04\}/$(printf %04d "$snapnum")}"
fi

python -u -m soap_tpu halo-properties parameter_files/FLAMINGO.yml \
    --sim-name="${sim}" --snap-nr="${snapnum}" \
    --chunks=1 ${dmo_flag}

echo "Job complete!"
