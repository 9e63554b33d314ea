"""Generate golden-value test fixtures by running the reference
implementation (bassamlab/SigmaRL, mounted read-only at /root/reference).

The reference's geometry/map code is pure torch and runs in this image even
though its heavy deps (vmas/torchrl/cvxpy) are absent. We dump its numeric
outputs to .npz files under tests/golden/, which the test suite then compares
against the sigmarl_tpu implementations. Run once; fixtures are committed.
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
sys.path.insert(0, REF)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(0)


def dump_maps():
    from sigmarl.parse_xml import ParseXML
    from sigmarl.parse_osm import ParseOSM

    parser = ParseXML(scenario_type="cpm_entire", device="cpu")
    data = {}
    for i, p in enumerate(parser.reference_paths):
        data[f"p{i}_center"] = p["center_line"].numpy()
        data[f"p{i}_lb_sh"] = p["left_boundary_shared"].numpy()
        data[f"p{i}_rb_sh"] = p["right_boundary_shared"].numpy()
        data[f"p{i}_yaw"] = p["center_line_yaw"].numpy()
        data[f"p{i}_loop"] = np.array(p["is_loop"])
        data[f"p{i}_lb_sh_pv"] = p["left_boundary_shared_pseudo_vector"].numpy()
        data[f"p{i}_rb_sh_pv"] = p["right_boundary_shared_pseudo_vector"].numpy()
    for j, fam in enumerate(
        [
            parser.reference_paths_intersection,
            parser.reference_paths_merge_in,
            parser.reference_paths_merge_out,
        ]
    ):
        for i, p in enumerate(fam):
            data[f"f{j}_{i}_center"] = p["center_line"].numpy()
            data[f"f{j}_{i}_lb_sh"] = p["left_boundary_shared"].numpy()
            data[f"f{j}_{i}_rb_sh"] = p["right_boundary_shared"].numpy()
    np.savez_compressed(os.path.join(OUT, "cpm_map.npz"), **data)
    print("cpm_map.npz:", len(data), "arrays")

    parser = ParseOSM(scenario_type="intersection_1", device="cpu")
    data = {}
    for i, p in enumerate(parser.reference_paths):
        data[f"p{i}_center"] = p["center_line"].numpy()
        data[f"p{i}_lb"] = p["left_boundary"].numpy()
        data[f"p{i}_rb"] = p["right_boundary"].numpy()
        data[f"p{i}_loop"] = np.array(p["is_loop"])
    np.savez_compressed(os.path.join(OUT, "osm_intersection_1.npz"), **data)
    print("osm_intersection_1.npz:", len(data), "arrays")


def dump_geometry():
    from sigmarl.helper_scenario import (
        get_perpendicular_distances,
        get_short_term_reference_path,
        get_rectangle_vertices,
        get_distances_between_agents,
        interX,
        transform_from_global_to_local_coordinate,
        compute_pseudo_tangent_vector,
    )

    g = torch.Generator().manual_seed(42)
    data = {}

    # Perpendicular distances: batch of points vs batched polylines with
    # per-env valid point counts.
    B, P = 16, 40
    poly = torch.cumsum(torch.rand((B, P, 2), generator=g) * 0.3, dim=1)
    pts = torch.rand((B, 2), generator=g) * 4
    n_valid = torch.randint(10, P, (B,), generator=g).to(torch.int32)
    d, idx = get_perpendicular_distances(pts, poly, n_valid)
    data.update(pd_poly=poly.numpy(), pd_pts=pts.numpy(), pd_n=n_valid.numpy(), pd_d=d.numpy(), pd_i=idx.numpy())

    # Short-term reference path.
    loop = torch.tensor([True, False] * 8)
    stp, sti = get_short_term_reference_path(
        poly, idx, 3, device=torch.device("cpu"),
        is_polyline_a_loop=loop, n_points_long_term=n_valid, sample_interval=2, n_points_shift=1,
    )
    data.update(st_path=stp.numpy(), st_idx=sti.numpy(), st_loop=loop.numpy())

    # Rectangle vertices.
    center = torch.rand((B, 2), generator=g)
    yaw = (torch.rand((B, 1), generator=g) - 0.5) * 6
    verts = get_rectangle_vertices(center, yaw, 0.107, 0.22, is_close_shape=True)
    data.update(rv_center=center.numpy(), rv_yaw=yaw.numpy(), rv_verts=verts.numpy())

    # MTV + c2c distances for 4 agents.
    N = 4
    centers = torch.rand((B, N, 2), generator=g) * 0.6
    yaws = (torch.rand((B, N, 1), generator=g) - 0.5) * 6
    verts_all = torch.stack(
        [get_rectangle_vertices(centers[:, i], yaws[:, i], 0.107, 0.22, True) for i in range(N)],
        dim=1,
    )
    d_mtv = get_distances_between_agents(verts_all, "mtv", is_set_diagonal=True,
                                         x_semidim=torch.tensor(4.5), y_semidim=torch.tensor(4.0))
    d_c2c = get_distances_between_agents(centers.transpose(0, 1), "c2c", is_set_diagonal=True,
                                         x_semidim=torch.tensor(4.5), y_semidim=torch.tensor(4.0))
    data.update(mtv_verts=verts_all.numpy(), mtv_d=d_mtv.numpy(), c2c_centers=centers.numpy(), c2c_d=d_c2c.numpy())

    # interX: rectangle outlines vs polylines.
    L2 = torch.cumsum(torch.rand((B, 12, 2), generator=g) * 0.2, dim=1)
    hit = interX(verts_all[:, 0], L2, False)
    hit_pair = interX(verts_all[:, 0], verts_all[:, 1], False)
    data.update(ix_L2=L2.numpy(), ix_hit=hit.numpy(), ix_hit_pair=hit_pair.numpy())

    # Local-frame transform.
    pos_i = torch.rand((B, 2), generator=g)
    rot_i = (torch.rand((B, 1), generator=g) - 0.5) * 6
    pos_j = torch.rand((B, 7, 2), generator=g)
    rel = transform_from_global_to_local_coordinate(pos_i, pos_j, rot_i)
    data.update(tf_pos_i=pos_i.numpy(), tf_rot_i=rot_i.numpy(), tf_pos_j=pos_j.numpy(), tf_rel=rel.numpy())

    # Pseudo tangent vector.
    pline = torch.rand((23, 2), generator=g)
    data.update(ptv_in=pline.numpy(), ptv_out=compute_pseudo_tangent_vector(pline).numpy())

    np.savez_compressed(os.path.join(OUT, "geometry.npz"), **data)
    print("geometry.npz:", len(data), "arrays")


def dump_dynamics():
    # Minimal explicit-Euler odeint stub so the reference dynamics module
    # (which only uses method="euler") can run without torchdiffeq.
    import types

    def _odeint(func, y0, t, rtol=None, atol=None, method="euler"):
        assert method == "euler"
        ys = [y0]
        y = y0
        for k in range(len(t) - 1):
            dt = t[k + 1] - t[k]
            y = y + dt * func(t[k], y)
            ys.append(y)
        return torch.stack(ys, dim=0)

    sys.modules["torchdiffeq"] = types.SimpleNamespace(odeint=_odeint)
    sys.modules.setdefault(
        "vmas", types.SimpleNamespace()
    )
    # vmas Dynamics base class stub (reference KinematicBicycleModel subclasses it
    # but only uses plain attribute storage).
    vm = types.ModuleType("vmas.simulator.dynamics.common")

    class _Dyn:
        def __init__(self, *a, **k):
            pass

    vm.Dynamics = _Dyn
    sys.modules["vmas.simulator.dynamics.common"] = vm

    from sigmarl.dynamics import KinematicBicycleModel

    model = KinematicBicycleModel(
        l_f=0.075, l_r=0.075, max_speed=1.0, min_speed=-0.5,
        max_steering=31 * torch.pi / 180, min_steering=-31 * torch.pi / 180,
        max_acc=5.0, min_acc=-5.0, max_steering_rate=torch.pi / 2, min_steering_rate=-torch.pi / 2,
    )
    g = torch.Generator().manual_seed(7)
    B = 32
    x0 = torch.rand((B, 5), generator=g)
    x0[:, 2] = (x0[:, 2] - 0.5) * 6
    x0[:, 3] = x0[:, 3] * 1.5 - 0.5
    x0[:, 4] = (x0[:, 4] - 0.5) * 1.0
    u = (torch.rand((B, 2), generator=g) - 0.5) * torch.tensor([10.0, torch.pi])
    xs, betas, vels = [], [], []
    x = x0.clone()
    for _ in range(20):
        x, beta, vel = model.step(x, u, dt=0.05, tick_per_step=1)
        xs.append(x.clone()); betas.append(beta.clone()); vels.append(vel.clone())
    np.savez_compressed(
        os.path.join(OUT, "dynamics.npz"),
        x0=x0.numpy(), u=u.numpy(),
        xs=torch.stack(xs).numpy(), betas=torch.stack(betas).numpy(), vels=torch.stack(vels).numpy(),
    )
    print("dynamics.npz written")


def dump_pseudo_distance():
    from sigmarl.map_manager import MapManager
    from sigmarl.pseudo_distance import PseudoDistance

    mm = MapManager(scenario_type="cpm_mixed", device="cpu")
    pd = PseudoDistance("cpm_mixed", mm)
    g = torch.Generator().manual_seed(11)
    pos = torch.rand((64, 2), generator=g) * torch.tensor([2.0, 2.0]) + torch.tensor([1.0, 1.5])
    outs = {}
    for ref_id in range(4):
        left, right = pd.get_distance(torch.tensor(ref_id), pos)
        outs[f"r{ref_id}_left"] = left
        outs[f"r{ref_id}_right"] = right
    np.savez_compressed(os.path.join(OUT, "pseudo_distance.npz"), pos=pos.numpy(), **outs)
    print("pseudo_distance.npz written")


if __name__ == "__main__":
    which = sys.argv[1:] or ["maps", "geometry", "dynamics", "pseudo"]
    if "maps" in which:
        dump_maps()
    if "geometry" in which:
        dump_geometry()
    if "dynamics" in which:
        dump_dynamics()
    if "pseudo" in which:
        dump_pseudo_distance()
