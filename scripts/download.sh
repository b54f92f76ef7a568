#!/usr/bin/env bash
# Fetch the public weight assets the perceptual losses / metrics need and
# convert them into the framework's .npz layouts (equivalent of the
# reference's download.sh + its implicit torchvision/LPIPS downloads;
# reference consumers: model/networks/external_function.py:323-444 —
# torchvision VGG19; script/metrics.py — FID InceptionV3 + LPIPS AlexNet).
#
# Run once on a machine WITH network access; copy assets/ to the training
# host. Everything below is a public, widely-mirrored checkpoint.
#
# Usage:  bash scripts/download.sh [--datasets]
#   default      fetch + convert the three weight assets into assets/
#   --datasets   additionally print the dataset acquisition steps
#                (DeepFashion / Market-1501 / FaceForensics / ShapeNet
#                require per-dataset licenses — they cannot be scripted)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p assets /tmp/gfla_dl

fetch() { # url out
  [ -f "$2" ] && { echo "have $2"; return; }
  if command -v wget >/dev/null; then wget -q --show-progress -O "$2" "$1";
  else curl -L -o "$2" "$1"; fi
}

echo "== VGG19 (torchvision, for VGGLoss / PerceptualCorrectness) =="
fetch https://download.pytorch.org/models/vgg19-dcbb9e9d.pth \
      /tmp/gfla_dl/vgg19.pth
python scripts/convert_vgg_weights.py --state_dict /tmp/gfla_dl/vgg19.pth

echo "== InceptionV3 (pt_inception FID variant, for metrics FID) =="
fetch https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth \
      /tmp/gfla_dl/pt_inception.pth
python scripts/convert_inception_weights.py --state_dict /tmp/gfla_dl/pt_inception.pth

echo "== AlexNet + LPIPS linear heads (for metrics LPIPS) =="
fetch https://download.pytorch.org/models/alexnet-owt-7be5be79.pth \
      /tmp/gfla_dl/alexnet.pth
fetch https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/alex.pth \
      /tmp/gfla_dl/lpips_alex.pth
python scripts/convert_lpips_weights.py \
      --alexnet /tmp/gfla_dl/alexnet.pth --linear /tmp/gfla_dl/lpips_alex.pth

echo "== done: $(ls assets) =="

if [ "${1:-}" = "--datasets" ]; then
  cat <<'EOF'
Datasets (license-gated; follow the reference README's sources):
  DeepFashion  http://mmlab.ie.cuhk.edu.hk/projects/DeepFashion.html
               then: python scripts/generate_fashion_datasets.py
  Market-1501  http://www.liangzheng.com.cn/Project/project_reid.html
  FaceForensics https://github.com/ondyari/FaceForensics
               then: python scripts/extract_video_frames.py
                     python scripts/obtain_face_kp.py
  ShapeNet     render with github.com/chrischoy/3D-R2N2 (chair/car HDF5)
  iPER (dance) https://svip-lab.github.io/project/impersonator
  Dance skeletons (AlphaPose + video2d JSON packs for danceFashion/iPER;
               reference script/download_animation_skeletons.sh):
               gdrive id 17Fx56eJF_4-ky9GC8srh4sMuDwI3W0zq
               -> unrar into dataset/{danceFashion,iPER}/{train,test}_256/
Pretrained reference checkpoints (.pth) convert with:
  python scripts/convert_torch_checkpoint.py --pth <net_G.pth> --out <dir>
EOF
fi
