# nohup ./scripts/ours_ml_spaceinvader.bash > /dev/null &
# ours (two-phase: progressive virtual camera -> global refinement)
python exp_runner.py --mode train --conf ./confs/ml_virtual.conf --case spaceinvader_ori --global_conf ./confs/ml_global_womask.conf
