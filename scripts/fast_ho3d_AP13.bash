# nohup ./scripts/fast_ho3d_AP13.bash > /dev/null &
# ours, TPU fast preset: fused Pallas train kernels + occupancy sampling
# (same model/loss config as ours_ho3d_AP13.bash; see the conf headers)
python exp_runner.py --mode train --conf ./confs/ho3d_virtual_tpu_fast.conf --case AP13_ori --global_conf ./confs/ho3d_global_womask_tpu_fast.conf
