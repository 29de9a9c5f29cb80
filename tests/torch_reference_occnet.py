"""Pure-torch re-statement of the reference BEVFormerOcc forward (no mmcv).

This is the independent oracle for the end-to-end logit-parity test
(`tests/test_parity_oracle.py`): every module below restates the semantics of
the reference implementation, read from the reference sources —

- ResNet bottleneck trunk:      torchvision layout, mmdet `style='pytorch'`
                                (config `bevformer_base_occ.py:48-58`)
- FPN:                          mmdet FPN, `add_extra_convs='on_output'`,
                                `relu_before_extra_convs=True` (config :59-66)
- LearnedPositionalEncoding:    mmdet impl (config :130-135): channels =
                                [col_embed(x), row_embed(y)]
- BEVFormerEncoder:             `encoder.py:28-239` (get_reference_points,
                                point_sampling, hybrid 2-queue TSA refs)
- BEVFormerLayer:               `encoder.py:242-406`, operation order
                                ('self_attn','norm','cross_attn','norm',
                                 'ffn','norm')
- TemporalSelfAttention:        `temporal_self_attention.py:128-272`
- SpatialCrossAttention + MSDeformableAttention3D:
                                `spatial_cross_attention.py:75-400`
- multi_scale_deformable_attn_pytorch: the mmcv CPU fallback the reference
                                uses when CUDA is absent
                                (`spatial_cross_attention.py:394-396`)
- TransformerOcc:               `transformer_occ.py:170-320` (use_3d=True)
- BEVFormerOccHead:             `bevformer_occ_head.py:100-160`

Module attribute names are chosen so `state_dict()` produces the exact
reference checkpoint key layout (`img_backbone.layer1.0.conv1.weight`,
`pts_bbox_head.transformer.encoder.layers.0.attentions.1.deformable_attention
.value_proj.weight`, ...) — the same keys `occnet_tpu.utils.torch_convert.
load_bevformer_into_variables` consumes, so one fabricated checkpoint drives
both implementations.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


# ---------------------------------------------------------------------------
# Backbone: torchvision-layout ResNet bottleneck trunk, frozen-BN eval
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, mid, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        # 'pytorch' style: stride on the 3x3 (config :55 style='pytorch')
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, mid * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(mid * 4)
        if stride != 1 or in_ch != mid * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, mid * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(mid * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNetTrunk(nn.Module):
    def __init__(self, depth=50, out_indices=(1, 2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch, mid = 64, 64
        for stage, n in enumerate(STAGE_BLOCKS[depth]):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(Bottleneck(in_ch, mid, stride))
                in_ch = mid * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            mid *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# FPN (mmdet semantics, `bevformer_base_occ.py:59-66`)
# ---------------------------------------------------------------------------

class ConvModule2d(nn.Module):
    """mmcv ConvModule with norm_cfg=None: just `.conv` (bias=True)."""

    def __init__(self, in_ch, out_ch, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride,
                              padding=k // 2, bias=True)

    def forward(self, x):
        return self.conv(x)


class FPN(nn.Module):
    def __init__(self, in_channels=(512, 1024, 2048), out_channels=256,
                 num_outs=4, relu_before_extra_convs=True):
        super().__init__()
        self.relu_before_extra_convs = relu_before_extra_convs
        self.num_outs = num_outs
        self.lateral_convs = nn.ModuleList(
            [ConvModule2d(c, out_channels, 1) for c in in_channels])
        fpn = [ConvModule2d(out_channels, out_channels, 3)
               for _ in in_channels]
        # extra levels live in fpn_convs[n:], 'on_output', stride 2
        for _ in range(num_outs - len(in_channels)):
            fpn.append(ConvModule2d(out_channels, out_channels, 3, stride=2))
        self.fpn_convs = nn.ModuleList(fpn)

    def forward(self, inputs):
        n = len(self.lateral_convs)
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[-2:], mode="nearest")
        outs = [self.fpn_convs[i](laterals[i]) for i in range(n)]
        for i in range(n, self.num_outs):
            src = outs[-1]
            if self.relu_before_extra_convs and i > n:
                src = F.relu(src)
            outs.append(self.fpn_convs[i](src))
        return outs


# ---------------------------------------------------------------------------
# mmdet LearnedPositionalEncoding (config :130-135)
# ---------------------------------------------------------------------------

class LearnedPositionalEncoding(nn.Module):
    def __init__(self, num_feats, row_num_embed, col_num_embed):
        super().__init__()
        self.row_embed = nn.Embedding(row_num_embed, num_feats)
        self.col_embed = nn.Embedding(col_num_embed, num_feats)

    def forward(self, mask):
        h, w = mask.shape[-2:]
        x = torch.arange(w)
        y = torch.arange(h)
        x_embed = self.col_embed(x)
        y_embed = self.row_embed(y)
        pos = torch.cat(
            (x_embed.unsqueeze(0).repeat(h, 1, 1),
             y_embed.unsqueeze(1).repeat(1, w, 1)),
            dim=-1).permute(2, 0, 1).unsqueeze(0).repeat(
            mask.shape[0], 1, 1, 1)
        return pos


# ---------------------------------------------------------------------------
# mmcv multi_scale_deformable_attn_pytorch (the reference's CPU fallback)
# ---------------------------------------------------------------------------

def multi_scale_deformable_attn_pytorch(value, value_spatial_shapes,
                                        sampling_locations,
                                        attention_weights):
    bs, _, num_heads, embed_dims = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split(
        [h * w for h, w in value_spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for level, (h, w) in enumerate(value_spatial_shapes):
        value_l = value_list[level].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, embed_dims, h, w)
        grid_l = sampling_grids[:, :, :, level].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(value_l, grid_l, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampling_value_list.append(sampled)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points)
    output = (torch.stack(sampling_value_list, dim=-2).flatten(-2) *
              attention_weights).sum(-1).view(
        bs, num_heads * embed_dims, num_queries)
    return output.transpose(1, 2).contiguous()


# ---------------------------------------------------------------------------
# MSDeformableAttention3D + SpatialCrossAttention
# (`spatial_cross_attention.py:75-400`)
# ---------------------------------------------------------------------------

class MSDeformableAttention3D(nn.Module):
    def __init__(self, embed_dims=256, num_heads=8, num_levels=4,
                 num_points=8):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.sampling_offsets = nn.Linear(
            embed_dims, num_heads * num_levels * num_points * 2)
        self.attention_weights = nn.Linear(
            embed_dims, num_heads * num_levels * num_points)
        self.value_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, reference_points, spatial_shapes):
        """query (bs, Q, C); value (bs, V, C); reference_points
        (bs, Q, num_Z_anchors, 2) normalised."""
        bs, num_query, _ = query.shape
        bs, num_value, _ = value.shape
        value = self.value_proj(value)
        value = value.view(bs, num_value, self.num_heads, -1)
        sampling_offsets = self.sampling_offsets(query).view(
            bs, num_query, self.num_heads, self.num_levels, self.num_points,
            2)
        attention_weights = self.attention_weights(query).view(
            bs, num_query, self.num_heads, self.num_levels * self.num_points)
        attention_weights = attention_weights.softmax(-1)
        attention_weights = attention_weights.view(
            bs, num_query, self.num_heads, self.num_levels, self.num_points)

        # `spatial_cross_attention.py:350-373`: distribute the P offsets over
        # the num_Z_anchors projected reference points per query
        offset_normalizer = torch.stack(
            [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
        bs, num_query, num_Z_anchors, xy = reference_points.shape
        reference_points = reference_points[:, :, None, None, None, :, :]
        sampling_offsets = sampling_offsets / \
            offset_normalizer[None, None, None, :, None, :]
        bs, num_query, num_heads, num_levels, num_all_points, xy = \
            sampling_offsets.shape
        sampling_offsets = sampling_offsets.view(
            bs, num_query, num_heads, num_levels,
            num_all_points // num_Z_anchors, num_Z_anchors, xy)
        sampling_locations = reference_points + sampling_offsets
        sampling_locations = sampling_locations.view(
            bs, num_query, num_heads, num_levels, num_all_points, xy)
        return multi_scale_deformable_attn_pytorch(
            value, spatial_shapes, sampling_locations, attention_weights)


class SpatialCrossAttention(nn.Module):
    """Per-camera dynamic rebatching (`spatial_cross_attention.py:75-175`)."""

    def __init__(self, embed_dims=256, num_cams=6, num_heads=8, num_levels=4,
                 num_points=8):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_cams = num_cams
        self.deformable_attention = MSDeformableAttention3D(
            embed_dims, num_heads, num_levels, num_points)
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, key, value, reference_points_cam, bev_mask,
                spatial_shapes):
        """query (bs, Q, C); key/value (num_cam, V, bs, C);
        reference_points_cam (num_cam, bs, Q, D, 2); bev_mask same sans 2."""
        inp_residual = query
        slots = torch.zeros_like(query)
        bs, num_query, _ = query.size()
        D = reference_points_cam.size(3)
        indexes = []
        for i, mask_per_img in enumerate(bev_mask):
            # reference quirk: batch-0 mask drives the rebatch for all batches
            index_query_per_img = mask_per_img[0].sum(-1).nonzero().squeeze(-1)
            indexes.append(index_query_per_img)
        max_len = max([len(each) for each in indexes])

        queries_rebatch = query.new_zeros(
            [bs, self.num_cams, max_len, self.embed_dims])
        reference_points_rebatch = reference_points_cam.new_zeros(
            [bs, self.num_cams, max_len, D, 2])
        for j in range(bs):
            for i, reference_points_per_img in enumerate(
                    reference_points_cam):
                idx = indexes[i]
                queries_rebatch[j, i, :len(idx)] = query[j, idx]
                reference_points_rebatch[j, i, :len(idx)] = \
                    reference_points_per_img[j, idx]

        num_cams, v_len, bs_, _ = value.shape
        value = value.permute(2, 0, 1, 3).reshape(
            bs * self.num_cams, v_len, self.embed_dims)

        queries = self.deformable_attention(
            queries_rebatch.view(bs * self.num_cams, max_len,
                                 self.embed_dims),
            value,
            reference_points_rebatch.view(bs * self.num_cams, max_len, D, 2),
            spatial_shapes).view(bs, self.num_cams, max_len, self.embed_dims)
        for j in range(bs):
            for i, idx in enumerate(indexes):
                slots[j, idx] += queries[j, i, :len(idx)]

        count = bev_mask.sum(-1) > 0
        count = count.permute(1, 2, 0).sum(-1)
        count = torch.clamp(count, min=1.0)
        slots = slots / count[..., None]
        slots = self.output_proj(slots)
        return slots + inp_residual  # dropout is identity in eval


# ---------------------------------------------------------------------------
# TemporalSelfAttention (`temporal_self_attention.py:128-272`)
# ---------------------------------------------------------------------------

class TemporalSelfAttention(nn.Module):
    def __init__(self, embed_dims=256, num_heads=8, num_levels=1,
                 num_points=4, num_bev_queue=2):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_levels = num_levels
        self.num_points = num_points
        self.num_bev_queue = num_bev_queue
        self.sampling_offsets = nn.Linear(
            embed_dims * num_bev_queue,
            num_bev_queue * num_heads * num_levels * num_points * 2)
        self.attention_weights = nn.Linear(
            embed_dims * num_bev_queue,
            num_bev_queue * num_heads * num_levels * num_points)
        self.value_proj = nn.Linear(embed_dims, embed_dims)
        self.output_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, query_pos, reference_points,
                spatial_shapes):
        """query (bs, Q, C); value (bs*2, Q, C) queue or None; reference
        points (bs*2, Q, num_levels, 2)."""
        if value is None:
            bs, len_bev, c = query.shape
            value = torch.stack([query, query], 1).reshape(bs * 2, len_bev, c)
        identity = query
        if query_pos is not None:
            query = query + query_pos
        bs, num_query, embed_dims = query.shape
        _, num_value, _ = value.shape

        query = torch.cat([value[:bs], query], -1)
        value = self.value_proj(value)
        value = value.reshape(bs * self.num_bev_queue, num_value,
                              self.num_heads, -1)

        sampling_offsets = self.sampling_offsets(query).view(
            bs, num_query, self.num_heads, self.num_bev_queue,
            self.num_levels, self.num_points, 2)
        attention_weights = self.attention_weights(query).view(
            bs, num_query, self.num_heads, self.num_bev_queue,
            self.num_levels * self.num_points)
        attention_weights = attention_weights.softmax(-1)
        attention_weights = attention_weights.view(
            bs, num_query, self.num_heads, self.num_bev_queue,
            self.num_levels, self.num_points)
        attention_weights = attention_weights.permute(
            0, 3, 1, 2, 4, 5).reshape(
            bs * self.num_bev_queue, num_query, self.num_heads,
            self.num_levels, self.num_points).contiguous()
        sampling_offsets = sampling_offsets.permute(
            0, 3, 1, 2, 4, 5, 6).reshape(
            bs * self.num_bev_queue, num_query, self.num_heads,
            self.num_levels, self.num_points, 2)

        offset_normalizer = torch.stack(
            [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
        sampling_locations = reference_points[:, :, None, :, None, :] \
            + sampling_offsets / offset_normalizer[None, None, None, :,
                                                   None, :]
        output = multi_scale_deformable_attn_pytorch(
            value, spatial_shapes, sampling_locations, attention_weights)
        # fuse history and current (`temporal_self_attention.py:255-266`)
        output = output.permute(1, 2, 0)
        output = output.view(num_query, embed_dims, bs, self.num_bev_queue)
        output = output.mean(-1)
        output = output.permute(2, 0, 1)
        output = self.output_proj(output)
        return output + identity  # dropout identity in eval


# ---------------------------------------------------------------------------
# FFN (mmcv FFN key layout: layers.0.0 / layers.1)
# ---------------------------------------------------------------------------

class FFN(nn.Module):
    def __init__(self, embed_dims, feedforward_channels):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(embed_dims, feedforward_channels),
                          nn.ReLU(inplace=True), nn.Dropout(0.0)),
            nn.Linear(feedforward_channels, embed_dims),
            nn.Dropout(0.0))

    def forward(self, x):
        return x + self.layers(x)


# ---------------------------------------------------------------------------
# BEVFormerLayer + encoder (`encoder.py`)
# ---------------------------------------------------------------------------

class BEVFormerLayer(nn.Module):
    def __init__(self, embed_dims, ffn_dim, num_cams, sca_points,
                 sca_levels, tsa_points):
        super().__init__()
        self.attentions = nn.ModuleList([
            TemporalSelfAttention(embed_dims, num_points=tsa_points),
            SpatialCrossAttention(embed_dims, num_cams=num_cams,
                                  num_levels=sca_levels,
                                  num_points=sca_points),
        ])
        self.ffns = nn.ModuleList([FFN(embed_dims, ffn_dim)])
        self.norms = nn.ModuleList(
            [nn.LayerNorm(embed_dims) for _ in range(3)])

    def forward(self, query, value, bev_pos, ref_2d, bev_h, bev_w,
                spatial_shapes, reference_points_cam, bev_mask, prev_bev):
        # operation order ('self_attn','norm','cross_attn','norm','ffn',
        # 'norm'), `encoder.py:356-404`
        query = self.attentions[0](
            query, prev_bev, bev_pos, ref_2d,
            torch.tensor([[bev_h, bev_w]]))
        query = self.norms[0](query)
        query = self.attentions[1](
            query, value, value, reference_points_cam, bev_mask,
            spatial_shapes)
        query = self.norms[1](query)
        query = self.ffns[0](query)
        query = self.norms[2](query)
        return query


def get_reference_points(H, W, Z=8, num_points_in_pillar=4, dim="3d", bs=1):
    """`encoder.py:50-89`."""
    if dim == "3d":
        zs = torch.linspace(0.5, Z - 0.5, num_points_in_pillar).view(
            -1, 1, 1).expand(num_points_in_pillar, H, W) / Z
        xs = torch.linspace(0.5, W - 0.5, W).view(1, 1, W).expand(
            num_points_in_pillar, H, W) / W
        ys = torch.linspace(0.5, H - 0.5, H).view(1, H, 1).expand(
            num_points_in_pillar, H, W) / H
        ref_3d = torch.stack((xs, ys, zs), -1)
        ref_3d = ref_3d.permute(0, 3, 1, 2).flatten(2).permute(0, 2, 1)
        return ref_3d[None].repeat(bs, 1, 1, 1)
    ref_y, ref_x = torch.meshgrid(
        torch.linspace(0.5, H - 0.5, H), torch.linspace(0.5, W - 0.5, W),
        indexing="ij")
    ref_y = ref_y.reshape(-1)[None] / H
    ref_x = ref_x.reshape(-1)[None] / W
    ref_2d = torch.stack((ref_x, ref_y), -1)
    return ref_2d.repeat(bs, 1, 1).unsqueeze(2)


def point_sampling(reference_points, pc_range, img_metas):
    """`encoder.py:92-151` (fp32)."""
    ego2lidar = img_metas[0]["ego2lidar"]
    lidar2img = [m["lidar2img"] for m in img_metas]
    lidar2img = reference_points.new_tensor(lidar2img)
    ego2lidar = reference_points.new_tensor(ego2lidar)
    reference_points = reference_points.clone()
    reference_points[..., 0:1] = reference_points[..., 0:1] * \
        (pc_range[3] - pc_range[0]) + pc_range[0]
    reference_points[..., 1:2] = reference_points[..., 1:2] * \
        (pc_range[4] - pc_range[1]) + pc_range[1]
    reference_points[..., 2:3] = reference_points[..., 2:3] * \
        (pc_range[5] - pc_range[2]) + pc_range[2]
    reference_points = torch.cat(
        (reference_points, torch.ones_like(reference_points[..., :1])), -1)
    reference_points = reference_points.permute(1, 0, 2, 3)
    D, B, num_query = reference_points.size()[:3]
    num_cam = lidar2img.size(1)
    reference_points = reference_points.view(
        D, B, 1, num_query, 4).repeat(1, 1, num_cam, 1, 1).unsqueeze(-1)
    lidar2img = lidar2img.view(1, B, num_cam, 1, 4, 4).repeat(
        D, 1, 1, num_query, 1, 1)
    ego2lidar = ego2lidar.view(1, 1, 1, 1, 4, 4).repeat(
        D, 1, num_cam, num_query, 1, 1)
    reference_points_cam = torch.matmul(
        torch.matmul(lidar2img.float(), ego2lidar.float()),
        reference_points.float()).squeeze(-1)
    eps = 1e-5
    bev_mask = (reference_points_cam[..., 2:3] > eps)
    reference_points_cam = reference_points_cam[..., 0:2] / torch.maximum(
        reference_points_cam[..., 2:3],
        torch.ones_like(reference_points_cam[..., 2:3]) * eps)
    reference_points_cam[..., 0] /= img_metas[0]["img_shape"][0][1]
    reference_points_cam[..., 1] /= img_metas[0]["img_shape"][0][0]
    bev_mask = (bev_mask & (reference_points_cam[..., 1:2] > 0.0)
                & (reference_points_cam[..., 1:2] < 1.0)
                & (reference_points_cam[..., 0:1] < 1.0)
                & (reference_points_cam[..., 0:1] > 0.0))
    bev_mask = torch.nan_to_num(bev_mask)
    reference_points_cam = reference_points_cam.permute(2, 1, 3, 0, 4)
    bev_mask = bev_mask.permute(2, 1, 3, 0, 4).squeeze(-1)
    return reference_points_cam, bev_mask


class BEVFormerEncoder(nn.Module):
    def __init__(self, num_layers, embed_dims, ffn_dim, num_cams, pc_range,
                 num_points_in_pillar, sca_points, sca_levels, tsa_points):
        super().__init__()
        self.pc_range = pc_range
        self.num_points_in_pillar = num_points_in_pillar
        self.layers = nn.ModuleList([
            BEVFormerLayer(embed_dims, ffn_dim, num_cams, sca_points,
                           sca_levels, tsa_points)
            for _ in range(num_layers)])

    def forward(self, bev_query, value, bev_h, bev_w, bev_pos,
                spatial_shapes, prev_bev, img_metas):
        """bev_query (num_query, bs, C); value (num_cam, V, bs, C);
        bev_pos (num_query, bs, C)."""
        output = bev_query
        bs = bev_query.size(1)
        ref_3d = get_reference_points(
            bev_h, bev_w, self.pc_range[5] - self.pc_range[2],
            self.num_points_in_pillar, dim="3d", bs=bs)
        ref_2d = get_reference_points(bev_h, bev_w, dim="2d", bs=bs)
        reference_points_cam, bev_mask = point_sampling(
            ref_3d, self.pc_range, img_metas)
        shift_ref_2d = ref_2d.clone()

        bev_query = bev_query.permute(1, 0, 2)
        bev_pos = bev_pos.permute(1, 0, 2)
        bs, len_bev, num_bev_level, _ = ref_2d.shape
        if prev_bev is not None:
            prev_bev = prev_bev.permute(1, 0, 2)
            prev_bev = torch.stack(
                [prev_bev, bev_query], 1).reshape(bs * 2, len_bev, -1)
            hybird_ref_2d = torch.stack([shift_ref_2d, ref_2d], 1).reshape(
                bs * 2, len_bev, num_bev_level, 2)
        else:
            hybird_ref_2d = torch.stack([ref_2d, ref_2d], 1).reshape(
                bs * 2, len_bev, num_bev_level, 2)

        output = bev_query
        for layer in self.layers:
            output = layer(output, value, bev_pos, hybird_ref_2d, bev_h,
                           bev_w, spatial_shapes, reference_points_cam,
                           bev_mask, prev_bev)
        return output


# ---------------------------------------------------------------------------
# TransformerOcc (`transformer_occ.py:170-320`, use_3d=True)
# ---------------------------------------------------------------------------

class ConvModule3d(nn.Module):
    """mmcv ConvModule(conv_cfg=Conv3d, norm_cfg=BN3d, act=ReLU)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Conv3d(in_ch, out_ch, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm3d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TransformerOcc(nn.Module):
    def __init__(self, embed_dims, num_feature_levels, num_cams, pillar_h,
                 out_dim, num_classes, encoder):
        super().__init__()
        self.embed_dims = embed_dims
        self.pillar_h = pillar_h
        self.use_cams_embeds = True
        self.encoder = encoder
        self.level_embeds = nn.Parameter(
            torch.zeros(num_feature_levels, embed_dims))
        self.cams_embeds = nn.Parameter(torch.zeros(num_cams, embed_dims))
        middle_dims = embed_dims // pillar_h
        self.decoder = nn.Sequential(ConvModule3d(middle_dims, out_dim),
                                     ConvModule3d(out_dim, out_dim))
        self.predicter = nn.Sequential(
            nn.Linear(out_dim, out_dim * 2), nn.Softplus(),
            nn.Linear(out_dim * 2, num_classes))
        self.flow_predicter = nn.Sequential(
            nn.Linear(out_dim, out_dim * 2), nn.ReLU(),
            nn.Linear(out_dim * 2, 2))

    def get_bev_features(self, mlvl_feats, bev_queries, bev_h, bev_w,
                         bev_pos, prev_bev, img_metas):
        bs = mlvl_feats[0].size(0)
        bev_queries = bev_queries.unsqueeze(1).repeat(1, bs, 1)
        bev_pos = bev_pos.flatten(2).permute(2, 0, 1)

        feat_flatten = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            bs, num_cam, c, h, w = feat.shape
            spatial_shapes.append((h, w))
            feat = feat.flatten(3).permute(1, 0, 3, 2)
            if self.use_cams_embeds:
                feat = feat + self.cams_embeds[:, None, None, :]
            feat = feat + self.level_embeds[None, None, lvl:lvl + 1, :]
            feat_flatten.append(feat)
        feat_flatten = torch.cat(feat_flatten, 2)
        spatial_shapes = torch.as_tensor(spatial_shapes, dtype=torch.long)
        feat_flatten = feat_flatten.permute(0, 2, 1, 3)

        return self.encoder(
            bev_queries, feat_flatten, bev_h, bev_w, bev_pos,
            spatial_shapes, prev_bev, img_metas)

    def forward(self, mlvl_feats, bev_queries, bev_h, bev_w, bev_pos,
                prev_bev, img_metas):
        bev_embed = self.get_bev_features(
            mlvl_feats, bev_queries, bev_h, bev_w, bev_pos, prev_bev,
            img_metas)
        bs = mlvl_feats[0].size(0)
        bev_embed = bev_embed.permute(0, 2, 1).view(bs, -1, bev_h, bev_w)
        outputs = self.decoder(
            bev_embed.view(bs, -1, self.pillar_h, bev_h, bev_w))
        outputs = outputs.permute(0, 4, 3, 2, 1)
        flow_pred = self.flow_predicter(outputs)
        occ_pred = self.predicter(outputs)
        return bev_embed, occ_pred, flow_pred


# ---------------------------------------------------------------------------
# Head + detector (`bevformer_occ_head.py:100-160`, `bevformer_occ.py`)
# ---------------------------------------------------------------------------

class BEVFormerOccHead(nn.Module):
    def __init__(self, bev_h, bev_w, embed_dims, transformer):
        super().__init__()
        self.bev_h = bev_h
        self.bev_w = bev_w
        self.bev_embedding = nn.Embedding(bev_h * bev_w, embed_dims)
        self.positional_encoding = LearnedPositionalEncoding(
            embed_dims // 2, bev_h, bev_w)
        self.transformer = transformer

    def forward(self, mlvl_feats, img_metas, prev_bev=None):
        bs = mlvl_feats[0].shape[0]
        bev_queries = self.bev_embedding.weight
        bev_mask = torch.zeros((bs, self.bev_h, self.bev_w))
        bev_pos = self.positional_encoding(bev_mask)
        bev_embed, occ, flow = self.transformer(
            mlvl_feats, bev_queries, self.bev_h, self.bev_w, bev_pos,
            prev_bev, img_metas)
        return {"bev_embed": bev_embed, "occ": occ, "flow": flow}


class BEVFormerOcc(nn.Module):
    """Reference-layout torch model for the tiny gather-mode oracle config."""

    def __init__(self, bev_h=10, bev_w=10, embed_dims=32, ffn_dim=64,
                 num_layers=1, pillar_h=4, out_dim=8, num_classes=17,
                 num_cams=6, num_feature_levels=4, num_points_in_pillar=4,
                 sca_points=8, tsa_points=4,
                 pc_range=(-40.0, -40.0, -1.0, 40.0, 40.0, 5.4), depth=50):
        super().__init__()
        self.img_backbone = ResNetTrunk(depth)
        # the reference's `_dim_` ties FPN channels to embed_dims (config :36,61)
        self.img_neck = FPN(out_channels=embed_dims,
                            num_outs=num_feature_levels)
        encoder = BEVFormerEncoder(
            num_layers, embed_dims, ffn_dim, num_cams, list(pc_range),
            num_points_in_pillar, sca_points, num_feature_levels, tsa_points)
        transformer = TransformerOcc(
            embed_dims, num_feature_levels, num_cams, pillar_h, out_dim,
            num_classes, encoder)
        self.pts_bbox_head = BEVFormerOccHead(
            bev_h, bev_w, embed_dims, transformer)

    def extract_img_feat(self, img):
        """(B, N, 3, H, W) -> list of (B, N, C, h, w)
        (`bevformer_occ.py:66-99`, eval: no grid mask)."""
        B, N, C, H, W = img.shape
        img = img.reshape(B * N, C, H, W)
        feats = self.img_backbone(img)
        feats = self.img_neck(feats)
        return [f.view(B, N, *f.shape[1:]) for f in feats]

    def forward(self, img, img_metas, prev_bev=None):
        mlvl_feats = self.extract_img_feat(img)
        return self.pts_bbox_head(mlvl_feats, img_metas, prev_bev)
