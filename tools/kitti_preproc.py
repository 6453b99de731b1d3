#!/usr/bin/env python
"""KITTI Cars preprocessing.

Crops car instances from KITTI using instance masks + 3D labels, computes a
per-crop SRN-format camera (pose normalized by the 3D-box diagonal,
background white-composited), writing one single-view SRN scene per
instance.  Behavioral equivalent of /root/reference/tools/kitti_preproc.py
(168 LoC) without the mmcv dependency.
"""
import argparse
import os
import os.path as osp

import numpy as np
import cv2
from scipy.linalg import solve_triangular

# KITTI yaw rotation is about the camera-frame y axis; the extra fixed
# rotation maps the KITTI object frame to the SRN object frame.
ROT_CONVERSION = np.array(
    [[0, 1, 0],
     [0, 0, -1],
     [-1, 0, 0]], dtype=np.float32)


def yaw_to_rot_mat(yaw):
    """(*,) yaw -> (*, 3, 3) rotation about +y."""
    sin_yaw, cos_yaw = np.sin(yaw), np.cos(yaw)
    rot = np.zeros(np.shape(yaw) + (3, 3), dtype=np.float32)
    rot[..., 0, 0] = cos_yaw
    rot[..., 2, 2] = cos_yaw
    rot[..., 0, 2] = sin_yaw
    rot[..., 2, 0] = -sin_yaw
    rot[..., 1, 1] = 1
    return rot


def open_label_file(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(' ')
            rows.append([parts[0]] + [float(v) for v in parts[1:]])
    return rows


def open_calib_file(path, cam=2):
    assert 0 <= cam <= 3
    with open(path) as f:
        line = f.readlines()[cam]
    return np.array([float(v) for v in line.strip().split(' ')[1:]],
                    dtype=np.float32).reshape(3, 4)


def process_instance(image, seg, instance, inst_id, cam_intrinsic, cam_t_vec,
                     out_size, out_border):
    """Returns (img_crop, img_crop_ori, c2w, intrinsics_text) or None."""
    resize_tgt = out_size - out_border * 2
    mask = seg == inst_id + 1000
    ys, xs = mask.nonzero()
    if len(ys) == 0:
        return None
    y_min, y_max = ys.min(), ys.max() + 1
    x_min, x_max = xs.min(), xs.max() + 1
    h, w = y_max - y_min, x_max - x_min
    img_crop_ori = image[y_min:y_max, x_min:x_max].copy()
    img_crop_ori[~mask[y_min:y_max, x_min:x_max]] = 255

    # 3D box: [h, w, l, x, y, z, yaw] -> reorder dims to (l, h, w)
    bbox_3d = np.array(instance[8:], dtype=np.float32)
    bbox_3d[[0, 1, 2]] = bbox_3d[[2, 0, 1]]
    diag = np.linalg.norm(bbox_3d[:3])
    bbox_3d[3:6] += cam_t_vec
    bbox_3d[4] -= bbox_3d[1] / 2          # bottom-center -> center
    bbox_3d[:6] /= diag                    # normalize to unit diagonal
    rot_mat = yaw_to_rot_mat(bbox_3d[6]) @ ROT_CONVERSION
    c2w = np.concatenate(
        [rot_mat.T, rot_mat.T @ (-bbox_3d[3:6])[:, None]], axis=1)
    c2w = np.concatenate([c2w, [[0, 0, 0, 1]]], axis=0)

    hw_max = max(h, w)
    pad_tgt = max(round(np.linalg.norm(bbox_3d[:3]) * cam_intrinsic[0, 0]
                        / bbox_3d[5]), hw_max)
    scale = resize_tgt / pad_tgt
    if scale > 1:
        return None
    pad_x_l = (pad_tgt - w) // 2
    pad_x_r = pad_tgt - w - pad_x_l
    pad_y_t = (pad_tgt - h) // 2
    pad_y_b = pad_tgt - h - pad_y_t
    img_crop = np.pad(img_crop_ori,
                      ((pad_y_t, pad_y_b), (pad_x_l, pad_x_r), (0, 0)),
                      constant_values=255)
    img_crop = cv2.resize(img_crop, (resize_tgt, resize_tgt),
                          interpolation=cv2.INTER_LINEAR)
    img_crop = np.pad(img_crop,
                      ((out_border, out_border), (out_border, out_border),
                       (0, 0)), constant_values=255)
    intrinsics_text = '{:.6f} {:.6f} {:.6f} 0.\n0. 0. 0.\n1.\n{} {}\n'.format(
        cam_intrinsic[0, 0] * scale,
        (cam_intrinsic[0, 2] - x_min + pad_x_l) * scale + out_border,
        (cam_intrinsic[1, 2] - y_min + pad_y_t) * scale + out_border,
        img_crop.shape[0], img_crop.shape[1])
    return img_crop, img_crop_ori, c2w, intrinsics_text


def main():
    parser = argparse.ArgumentParser(description='Preprocess KITTI cars')
    parser.add_argument('--kitti-dir', default='data/kitti/training')
    parser.add_argument('--out-dir', default='data/shapenet/cars_kitti')
    parser.add_argument('--out-size', type=int, default=128)
    parser.add_argument('--out-border', type=int, default=4)
    args = parser.parse_args()

    image_dir = osp.join(args.kitti_dir, 'image_2')
    seg_dir = osp.join(args.kitti_dir, 'instance_2')
    label_dir = osp.join(args.kitti_dir, 'label_2')
    calib_dir = osp.join(args.kitti_dir, 'calib')
    os.makedirs(args.out_dir, exist_ok=True)

    for label_file in sorted(os.listdir(label_dir)):
        basename = osp.splitext(label_file)[0]
        label = open_label_file(osp.join(label_dir, label_file))
        cali_mat = open_calib_file(osp.join(calib_dir, label_file))
        cam_intrinsic = cali_mat[:, :3]
        cam_t_vec = solve_triangular(cam_intrinsic, cali_mat[:, 3:],
                                     lower=False).squeeze(-1)
        image = cv2.imread(osp.join(image_dir, basename + '.png'),
                           cv2.IMREAD_UNCHANGED)
        seg = cv2.imread(osp.join(seg_dir, basename + '.png'),
                         cv2.IMREAD_UNCHANGED)
        for i, instance in enumerate(label):
            # truncation == 0 and occlusion == 0 only
            if instance[1] != 0 or instance[2] != 0:
                continue
            out = process_instance(image, seg, instance, i, cam_intrinsic,
                                   cam_t_vec, args.out_size, args.out_border)
            if out is None:
                continue
            img_crop, img_crop_ori, c2w, intrinsics_text = out
            inst_dir = osp.join(args.out_dir, f'{basename}_{i:03d}')
            os.makedirs(osp.join(inst_dir, 'rgb'), exist_ok=True)
            os.makedirs(osp.join(inst_dir, 'pose'), exist_ok=True)
            cv2.imwrite(osp.join(inst_dir, 'rgb', '000000.png'), img_crop)
            cv2.imwrite(osp.join(inst_dir, '000000.png'), img_crop_ori)
            np.savetxt(osp.join(inst_dir, 'pose', '000000.txt'),
                       c2w.reshape(1, -1))
            with open(osp.join(inst_dir, 'intrinsics.txt'), 'w') as f:
                f.write(intrinsics_text)
        print(f'{basename} done', flush=True)


if __name__ == '__main__':
    main()
