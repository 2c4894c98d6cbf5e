#!/bin/bash
# Train + evaluate every active config (reference: run.sh)
set -e

train_and_evaluate() {
    config_name=$1
    test_dir=$2
    echo "=== $config_name ==="
    python train.py --conf-dir "rtfs_net_tpu/configs/${config_name}.yaml"
    exp_name=$(python -c "import yaml;print(yaml.safe_load(open('rtfs_net_tpu/configs/${config_name}.yaml'))['log']['exp_name'])")
    exp_path=$(python -c "import yaml;c=yaml.safe_load(open('rtfs_net_tpu/configs/${config_name}.yaml'));import os;print(os.path.join(c['log']['path'], c['log']['exp_name']))")
    python test.py --conf-dir "${exp_path}/conf.yaml" --test-dir "$test_dir"
}

for depth in 4 6 12; do
    train_and_evaluate "lrs2_RTFSNet_${depth}_layer" "data_preprocess/LRS2/tt"
    train_and_evaluate "lrs3_RTFSNet_${depth}_layer" "data_preprocess/LRS3/tt"
    train_and_evaluate "voxceleb2_RTFSNet_${depth}_layer" "data_preprocess/VOX2/tt"
done
train_and_evaluate "lrs2_CTCNet_16_layer" "data_preprocess/LRS2/tt"
