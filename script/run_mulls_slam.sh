#!/bin/sh
#########################################################################################
#                         mulls_tpu SLAM (MULLS-SLAM parity)                            #
# Mirror of the reference driver script (`script/run_mulls_slam.sh`): edit the          #
# configure block, run, get poses / maps / timing / evaluation in the same formats.     #
############################# part to configure (down) ##################################
sequence_id=00

# experiment unique name
exp_id=demo

# data path (project folder)
project_folder=/root/reference/demo_data

# point cloud format (pcd, ply, las, txt, h5, csv, bin)
pc_format=pcd

# input point cloud folder path
pc_folder=${project_folder}/${pc_format}

# input ground truth pose file path (optional; comment out if none)
#gt_body_pose_file=${project_folder}/${sequence_id}.txt

# input calibration file path (optional)
#calib_file=${project_folder}/calib.txt

# input config file path (the reference's gflag files load unchanged)
config_file=/root/reference/script/config/lo_gflag_list_kitti_urban.txt

# frame range
frame_begin=0
frame_end=99999
frame_step=1
############################### part to configure (up) ##################################

result_folder=${RESULT_FOLDER:-/tmp/mulls_tpu_result}/${exp_id}
mkdir -p "${result_folder}" "${result_folder}/map_point_clouds"

lo_adjacent_tran_file=${result_folder}/Rt_lo_${exp_id}.txt
lo_lidar_pose_file=${result_folder}/pose_l_lo_${exp_id}.txt
lo_body_pose_file=${result_folder}/pose_b_lo_${exp_id}.txt
gt_lidar_pose_file=${result_folder}/pose_l_gt.txt
lo_lidar_pose_point_cloud=${result_folder}/traj_l_lo_${exp_id}.pcd
timing_report_file=${result_folder}/timing_table_${exp_id}.txt
evaluation_file=${result_folder}/evaluation_${exp_id}.json

python -m mulls_tpu.apps.slam \
  --point_cloud_folder="${pc_folder}" \
  --pc_format=".${pc_format}" \
  ${gt_body_pose_file:+--gt_body_pose_file_path="${gt_body_pose_file}"} \
  ${calib_file:+--calib_file_path="${calib_file}"} \
  --output_adjacent_lo_pose_file_path="${lo_adjacent_tran_file}" \
  --output_lo_lidar_pose_file_path="${lo_lidar_pose_file}" \
  --output_lo_body_pose_file_path="${lo_body_pose_file}" \
  --output_gt_lidar_pose_file_path="${gt_lidar_pose_file}" \
  --output_map_point_cloud_folder_path="${result_folder}/map_point_clouds" \
  --lo_lidar_pose_point_cloud="${lo_lidar_pose_point_cloud}" \
  --timing_report_file="${timing_report_file}" \
  --evaluation_file="${evaluation_file}" \
  --frame_num_begin=${frame_begin} \
  --frame_num_end=${frame_end} \
  --frame_step=${frame_step} \
  --flagfile="${config_file}" \
  --gt_in_lidar_frame=0 \
  --gt_oxts_format=0 \
  --write_out_map_on=0 \
  --write_out_gt_map_on=0 \
  --write_map_each_frame=0 \
  --progress \
  "$@"

# offline evaluation / plots (the reference calls python/kitti_eval.py + evo)
# python -m mulls_tpu.apps.eval_run \
#   --est_pose_file "${lo_body_pose_file}" \
#   --gt_pose_file "${gt_body_pose_file}" \
#   --out_dir "${result_folder}/eval"
