#!/bin/sh
#########################################################################################
#             mulls_tpu pairwise point cloud registration (MULLS-Reg parity)            #
# Mirror of the reference `script/run_mulls_reg.sh`.                                    #
############################# part to configure (down) ##################################

# data path (*.pcd, *.las, *.ply, *.txt, *.h5, *.bin)
tpc_path=/root/reference/demo_data/pcd/000000.pcd
spc_path=/root/reference/demo_data/pcd/000015.pcd
opc_path=${RESULT_FOLDER:-/tmp/mulls_tpu_result}/000015_reg.pcd

############################### part to configure (up) ##################################
mkdir -p "$(dirname "${opc_path}")"

python -m mulls_tpu.apps.reg \
  --point_cloud_1_path="${tpc_path}" \
  --point_cloud_2_path="${spc_path}" \
  --output_point_cloud_path="${opc_path}" \
  --realtime_viewer_on=0 \
  --cloud_1_down_res=0.00 \
  --cloud_2_down_res=0.00 \
  --dist_inverse_sampling_method=2 \
  --pca_neighbor_radius=1.0 \
  --pca_neighbor_count=50 \
  --gf_grid_size=2.0 \
  --gf_in_grid_h_thre=0.25 \
  --gf_neigh_grid_h_thre=1.2 \
  --gf_ground_down_rate=10 \
  --gf_nonground_down_rate=3 \
  --linearity_thre=0.65 \
  --planarity_thre=0.65 \
  --curvature_thre=0.10 \
  --reciprocal_corr_on=false \
  --fixed_num_corr_on=false \
  --corr_dis_thre=3.0 \
  --converge_tran=0.001 \
  --converge_rot_d=0.01 \
  --reg_max_iter_num=10 \
  --teaser_on=true \
  --is_global_reg=1 \
  --json_out="${opc_path%.pcd}.json" \
  "$@"
