# nohup ./scripts/gt_ho3d_AP13.bash > /dev/null &
# GT-pose NeuS upper bound (unified runner handles the gt conf directly)
python exp_runner.py --mode train --conf ./confs/ho3d_gt.conf --case AP13
