# nohup ./scripts/barf_ho3d_AP13.bash > /dev/null &
# BARF baseline
python exp_runner.py --mode train --conf ./confs/ho3d_barf.conf --case AP13
