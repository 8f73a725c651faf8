# nohup ./scripts/barf_ml_spaceinvader.bash > /dev/null &
# BARF baseline
python exp_runner.py --mode train --conf ./confs/ml_barf.conf --case spaceinvader
