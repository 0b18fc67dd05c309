"""LinK-CenterPoint nuScenes config (reference:
detection/configs/nusc/voxelnet/nusc_centerpoint_voxelnet_0075voxel_fix_bn_z_elkv3.py).
Consumed by link_tpu.utils.config.load_py_config; tools/det_train.py and
tools/det_test.py read these hyperparameters via --config."""

import itertools

tasks = [
    dict(num_class=1, class_names=["car"]),
    dict(num_class=2, class_names=["truck", "construction_vehicle"]),
    dict(num_class=2, class_names=["bus", "trailer"]),
    dict(num_class=1, class_names=["barrier"]),
    dict(num_class=2, class_names=["motorcycle", "bicycle"]),
    dict(num_class=2, class_names=["pedestrian", "traffic_cone"]),
]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

model = dict(
    type="VoxelNet",
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    backbone=dict(type="SpMiddleResNetFHDELKv3", num_input_features=5,
                  ds_factor=8, block_sz=7, elk_r=3),
    neck=dict(type="RPN", layer_nums=[5, 5], ds_layer_strides=[1, 2],
              ds_num_filters=[128, 256], us_layer_strides=[1, 2],
              us_num_filters=[256, 256], num_input_features=256),
    bbox_head=dict(type="CenterHead", in_channels=512, tasks=tasks,
                   dataset="nuscenes", weight=0.25,
                   code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2,
                                 1.0, 1.0],
                   common_heads={"reg": (2, 2), "height": (1, 2),
                                 "dim": (3, 2), "rot": (2, 2),
                                 "vel": (2, 2)},
                   share_conv_channel=64),
)

assigner = dict(out_size_factor=8, dense_reg=1, gaussian_overlap=0.1,
                max_objs=500, min_radius=2)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
    nms=dict(use_rotate_nms=True, nms_pre_max_size=1000,
             nms_post_max_size=83, nms_iou_threshold=0.2),
    score_threshold=0.1,
    pc_range=[-54, -54],
    out_size_factor=8,
    voxel_size=[0.075, 0.075],
)

voxel_generator = dict(
    range=[-54, -54, -5.0, 54, 54, 3.0],
    voxel_size=[0.075, 0.075, 0.2],
    max_points_in_voxel=10,
    max_voxel_num=[120000, 160000],
)

db_sampler = dict(
    type="GT-AUG", enable=True,
    db_info_path="data/nuScenes/dbinfos_train_10sweeps_withvelo.pkl",
    sample_groups=[dict(car=2), dict(truck=3), dict(construction_vehicle=7),
                   dict(bus=4), dict(trailer=6), dict(barrier=2),
                   dict(motorcycle=6), dict(bicycle=6), dict(pedestrian=2),
                   dict(traffic_cone=2)],
    rate=1.0,
)

train_preprocessor = dict(mode="train", shuffle_points=True,
                          global_rot_noise=[-0.78539816, 0.78539816],
                          global_scale_noise=[0.9, 1.1],
                          global_translate_std=0.5, db_sampler=db_sampler,
                          class_names=class_names)

data = dict(samples_per_gpu=2, workers_per_gpu=3, nsweeps=10,
            train_anno="data/nuScenes/infos_train_10sweeps_withvelo_filter_True.pkl",
            val_anno="data/nuScenes/infos_val_10sweeps_withvelo_filter_True.pkl")

optimizer = dict(type="adam", amsgrad=0.0, wd=0.01, fixed_wd=True)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.001, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
total_epochs = 20
