#!/bin/bash -l
#
# EAGLE SOAP catalogue for one snapshot.  TPU-native counterpart of the
# reference's scripts/EAGLE.sh: converts the GADGET particledata to a
# SWIFT-layout snapshot + membership file (replacing the reference's
# symlink forest + Hdecompose + virtual-snapshot steps), then runs the
# halo-properties pipeline with the EAGLE SubFind catalogue reader.
#
#   mkdir -p logs
#   SIM_NAME='L0100N1504/PE/REFERENCE' SNAP_NR=28 Z_SUFFIX=z000p000 \
#       sbatch scripts/EAGLE/halo_properties.sh
#
#SBATCH --nodes=1
#SBATCH --cpus-per-task=16
#SBATCH -o ./logs/eagle_%x.%A.out
#SBATCH -t 02:00:00
#
set -e

sim_name="${SIM_NAME:?e.g. L0100N1504/PE/REFERENCE}"
snap_nr=$(printf %03d "${SNAP_NR:?snapshot number, e.g. 28}")
z_suffix="${Z_SUFFIX:?e.g. z000p000}"
sim_dir="${EAGLE_DATA:?}/${sim_name}/data"
output_dir="${EAGLE_OUTPUT:?}/${sim_name}"

particledata="${sim_dir}/particledata_${snap_nr}_${z_suffix}/eagle_subfind_particles_${snap_nr}_${z_suffix}"
subfind="${sim_dir}/groups_${snap_nr}_${z_suffix}/eagle_subfind_tab_${snap_nr}_${z_suffix}"

mkdir -p "${output_dir}"
snapshot="${output_dir}/swift_snapshot_${snap_nr}.hdf5"
membership="${output_dir}/membership_${snap_nr}.hdf5"

# one-shot GADGET -> SWIFT-layout conversion (reference:
# misc/convert_eagle.py run under MPI; here a single-process tool)
python -u -m soap_tpu convert-eagle \
    "${particledata}" "${snapshot}" "${membership}" \
    --subfind-basename "${subfind}"

python -u -m soap_tpu halo-properties parameter_files/EAGLE.yml \
    --sim-name="${sim_name}" --snap-nr="${SNAP_NR}" --chunks=1

echo "Job complete!"
