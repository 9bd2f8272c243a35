"""Parse the reference's global-coordinate MJCF humanoid into a static spec.

The reference scene files (``/root/reference/assets/mujoco_models/*.xml``) use
MuJoCo's removed ``coordinate="global"`` mode: body/joint/geom positions are
given in the world frame of the rest pose and every body quaternion is
identity, with mesh STL vertices stored directly in world coordinates. We
parse that representation once (host-side numpy), derive:

- the kinematic tree (parents, local offsets, per-dof hinge axes),
- exact per-body mass / CoM / inertia from the mesh geoms (density 1000,
  matching ``inertiafromgeom="true"``),
- local-frame mesh vertices for contact-point extraction,
- the interactable object bodies (chair / box / table / Can / step) with
  their primitive geoms,

and can also emit an equivalent *local*-coordinate MJCF + translated STLs so
modern MuJoCo (>= 2.3, which dropped global coordinates) can load the same
model as a CPU test oracle.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

from kinpoly_tpu.anim import stl

# canonical SMPL bone order (reference uhc/smpllib/smpl_parser.py SMPL_BONE_ORDER_NAMES)
SMPL_BONE_NAMES = [
    "Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe",
    "R_Hip", "R_Knee", "R_Ankle", "R_Toe",
    "Torso", "Spine", "Chest", "Neck", "Head",
    "L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand",
    "R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand",
]


@dataclass(frozen=True)
class Geom:
    """A primitive collision geom attached to a body, in body-local frame."""
    body: int                 # index into the owning body table
    gtype: str                # 'plane' | 'box' | 'cylinder' | 'sphere' | 'capsule'
    size: np.ndarray          # MuJoCo size semantics per type
    pos: np.ndarray           # (3,)
    quat: np.ndarray          # (4,) wxyz
    friction: np.ndarray      # (3,)
    condim: int
    margin: float
    mass: float | None = None


@dataclass(frozen=True)
class ObjectSpec:
    """A free-floating interactable object (chair/box/table/Can/step)."""
    name: str
    geoms: tuple[Geom, ...]   # body index is 0 (the object's own body)
    mass: float = 0.0
    com: np.ndarray = field(default_factory=lambda: np.zeros(3))
    inertia: np.ndarray = field(default_factory=lambda: np.eye(3))


@dataclass(frozen=True)
class HumanoidSpec:
    """Static description of the SMPL-neutral humanoid. All numpy, host-side;
    fields used in jitted code are converted to jnp once at trace time."""

    body_names: tuple[str, ...]        # (24,)
    parents: np.ndarray                # (24,) int, -1 for Pelvis
    body_pos: np.ndarray               # (24, 3) local offset from parent
    body_ipos: np.ndarray              # (24, 3) local CoM
    body_mass: np.ndarray              # (24,)
    body_inertia: np.ndarray           # (24, 3, 3) about CoM, body frame
    joint_axes: np.ndarray             # (23, 3, 3) hinge axes rows (z, y, x) in body frame
    jnt_range: np.ndarray              # (69, 2) radians
    armature: np.ndarray               # (75,) added rotor inertia per dof
    timestep: float
    mesh_verts: tuple[np.ndarray, ...]  # per body (Vi, 3) local frame
    mesh_faces: tuple[np.ndarray, ...]
    objects: tuple[ObjectSpec, ...]
    floor_friction: np.ndarray         # (3,)
    geom_margin: float

    # -- derived conveniences ------------------------------------------------
    @property
    def n_bodies(self) -> int:
        return len(self.body_names)

    @property
    def nq(self) -> int:
        return 7 + 3 * (self.n_bodies - 1)

    @property
    def nv(self) -> int:
        return 6 + 3 * (self.n_bodies - 1)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)


def _parse_vec(s: str) -> np.ndarray:
    return np.array([float(x) for x in s.split()], dtype=np.float64)


def parse_humanoid(xml_path: str) -> HumanoidSpec:
    """Parse the reference global-coordinate MJCF (+ STL meshes) to a spec."""
    tree = ET.parse(xml_path)
    root = tree.getroot()
    compiler = root.find("compiler")
    assert compiler.get("coordinate") == "global", "expected the reference global-coordinate MJCF"
    use_degrees = compiler.get("angle", "degree") == "degree"
    base_dir = os.path.dirname(os.path.abspath(xml_path))

    timestep = float(root.find("option").get("timestep", "0.002"))

    # defaults (the reference uses a single default class)
    default = root.find("default")
    d_joint = default.find("joint") if default is not None else None
    d_geom = default.find("geom") if default is not None else None
    default_armature = float(d_joint.get("armature", "0")) if d_joint is not None else 0.0
    default_margin = float(d_geom.get("margin", "0")) if d_geom is not None else 0.0
    default_condim = int(d_geom.get("condim", "1")) if d_geom is not None else 1

    mesh_files = {m.get("name", os.path.splitext(os.path.basename(m.get("file")))[0]): os.path.join(base_dir, m.get("file"))
                  for m in root.find("asset").findall("mesh")}

    worldbody = root.find("worldbody")

    floor = None
    for g in worldbody.findall("geom"):
        if g.get("type") == "plane":
            floor = g
    floor_friction = _parse_vec(floor.get("friction", "1 0.005 0.0001")) if floor is not None else np.array([1.0, 0.005, 0.0001])

    body_names: list[str] = []
    parents: list[int] = []
    world_pos: list[np.ndarray] = []
    joint_axes: list[np.ndarray] = []
    jnt_range: list[np.ndarray] = []
    mesh_names: list[str] = []
    objects: list[ObjectSpec] = []

    def walk(elem, parent_idx):
        name = elem.get("name")
        joints = elem.findall("joint")
        if len(joints) == 1 and joints[0].get("type") == "free" and name != "Pelvis":
            objects.append(_parse_object(elem, default_margin))
            return
        idx = len(body_names)
        body_names.append(name)
        parents.append(parent_idx)
        pos = _parse_vec(elem.get("pos"))
        quat = _parse_vec(elem.get("quat", "1 0 0 0"))
        assert np.allclose(quat, [1, 0, 0, 0]), f"non-identity body quat on {name}"
        world_pos.append(pos)
        if parent_idx == -1:
            assert joints[0].get("type") == "free"
        else:
            assert len(joints) == 3, f"{name} must have 3 hinges"
            axes, ranges = [], []
            for j in joints:
                assert j.get("type") == "hinge"
                jpos = _parse_vec(j.get("pos"))
                assert np.allclose(jpos, pos), f"joint of {name} not at body origin"
                axes.append(_parse_vec(j.get("axis")))
                r = _parse_vec(j.get("range"))
                ranges.append(np.deg2rad(r) if use_degrees else r)
            joint_axes.append(np.stack(axes))
            jnt_range.extend(ranges)
        geom = elem.find("geom")
        assert geom is not None and geom.get("type") == "mesh"
        mesh_names.append(geom.get("mesh"))
        for child in elem.findall("body"):
            walk(child, idx)

    for b in worldbody.findall("body"):
        walk(b, -1)

    parents_arr = np.asarray(parents, dtype=np.int32)
    world_pos_arr = np.stack(world_pos)
    body_pos = world_pos_arr.copy()
    has_parent = parents_arr >= 0
    body_pos[has_parent] -= world_pos_arr[parents_arr[has_parent]]

    # mesh geometry + exact mass properties (world verts -> body-local)
    mesh_verts, mesh_faces, ipos, mass, inertia = [], [], [], [], []
    for i, mname in enumerate(mesh_names):
        verts, faces = stl.read_stl(mesh_files[mname])
        local = verts - world_pos_arr[i]
        mp = stl.mesh_mass_properties(local, faces, density=1000.0)
        mesh_verts.append(local)
        mesh_faces.append(faces)
        ipos.append(mp.com)
        mass.append(mp.mass)
        inertia.append(mp.inertia)

    armature = np.full(6 + 3 * (len(body_names) - 1), default_armature)
    armature[:6] = 0.0  # free joint has armature=0 in the reference model

    return HumanoidSpec(
        body_names=tuple(body_names),
        parents=parents_arr,
        body_pos=body_pos,
        body_ipos=np.stack(ipos),
        body_mass=np.asarray(mass),
        body_inertia=np.stack(inertia),
        joint_axes=np.stack(joint_axes),
        jnt_range=np.stack(jnt_range),
        armature=armature,
        timestep=timestep,
        mesh_verts=tuple(mesh_verts),
        mesh_faces=tuple(mesh_faces),
        objects=tuple(objects),
        floor_friction=floor_friction,
        geom_margin=default_margin,
    )


def _quat_from_euler_xyz(e: np.ndarray) -> np.ndarray:
    """Extrinsic x-y-z euler -> wxyz quaternion (host-side numpy)."""
    def aa(angle, axis):
        q = np.zeros(4)
        q[0] = np.cos(angle / 2)
        q[1 + axis] = np.sin(angle / 2)
        return q

    def mul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])

    return mul(aa(e[2], 2), mul(aa(e[1], 1), aa(e[0], 0)))


def _parse_object(elem, default_margin: float) -> ObjectSpec:
    geoms = []
    total_mass, wsum = 0.0, np.zeros(3)
    for g in elem.findall("geom"):
        gtype = g.get("type", "sphere")
        pos = _parse_vec(g.get("pos", "0 0 0"))
        if g.get("euler") is not None:
            e = np.deg2rad(_parse_vec(g.get("euler")))
            quat = _quat_from_euler_xyz(e)  # MuJoCo default eulerseq="xyz" (extrinsic)
        else:
            quat = _parse_vec(g.get("quat", "1 0 0 0"))
        m = float(g.get("mass", "0"))
        geoms.append(Geom(
            body=0,
            gtype=gtype,
            size=_parse_vec(g.get("size")),
            pos=pos,
            quat=quat,
            friction=_parse_vec(g.get("friction", "1 0.005 0.0001")),
            condim=int(g.get("condim", "1")),
            margin=float(g.get("margin", str(default_margin))),
            mass=m,
        ))
        total_mass += m
        wsum += m * pos
    com = wsum / max(total_mass, 1e-9)
    # crude box/cylinder inertia sum about com (objects are mostly static props)
    I = np.zeros((3, 3))
    for g in geoms:
        m = g.mass or 0.0
        if g.gtype == "box":
            s = g.size
            diag = m / 3.0 * np.array([s[1] ** 2 + s[2] ** 2, s[0] ** 2 + s[2] ** 2, s[0] ** 2 + s[1] ** 2])
        elif g.gtype == "cylinder":
            r, h = g.size[0], g.size[1]
            diag = m * np.array([r * r / 4 + h * h / 3, r * r / 4 + h * h / 3, r * r / 2])
        else:
            r = g.size[0]
            diag = np.full(3, 0.4 * m * r * r)
        Ig = np.diag(diag)
        r_off = g.pos - com
        I += Ig + m * (np.eye(3) * (r_off @ r_off) - np.outer(r_off, r_off))
    return ObjectSpec(name=elem.get("name"), geoms=tuple(geoms), mass=total_mass, com=com, inertia=I)


# ---------------------------------------------------------------------------
# MuJoCo >= 3 oracle export (local coordinates)
# ---------------------------------------------------------------------------


def export_local_mjcf(spec: HumanoidSpec, out_dir: str, with_objects: bool = False,
                      explicit_inertia: bool = False) -> str:
    """Write a local-coordinate MJCF + translated STLs equivalent to the
    reference global-coordinate model, loadable by MuJoCo 3.x (test oracle).

    Returns the XML path.
    """
    os.makedirs(os.path.join(out_dir, "geom"), exist_ok=True)
    for name, verts, faces in zip(spec.body_names, spec.mesh_verts, spec.mesh_faces):
        stl.write_stl(os.path.join(out_dir, "geom", f"{name}.stl"), verts, faces)

    lines = [
        '<mujoco model="humanoid_local">',
        f'  <compiler angle="radian" inertiafromgeom="{"false" if explicit_inertia else "true"}"/>',
        '  <size njmax="8000" nconmax="4000"/>',
        f'  <option timestep="{spec.timestep}"/>',
        '  <default>',
        '    <joint damping="0.0" armature="0.01" stiffness="0.0" limited="true"/>',
        '    <geom conaffinity="7" condim="1" contype="7" margin="0.001" rgba="0.8 0.6 .4 1"/>',
        '  </default>',
        '  <asset>',
    ]
    for name in spec.body_names:
        lines.append(f'    <mesh name="{name}" file="geom/{name}.stl"/>')
    lines += ['  </asset>', '  <worldbody>',
              '    <geom name="floor" type="plane" condim="3" friction="{} {} {}" pos="0 0 0" size="100 100 .2"/>'.format(*spec.floor_friction)]

    children: dict[int, list[int]] = {}
    for i, p in enumerate(spec.parents):
        children.setdefault(int(p), []).append(i)

    jr = spec.jnt_range

    def emit(i: int, indent: str):
        name = spec.body_names[i]
        pos = spec.body_pos[i]
        lines.append(f'{indent}<body name="{name}" pos="{pos[0]} {pos[1]} {pos[2]}">')
        if explicit_inertia:
            m = spec.body_mass[i]
            c = spec.body_ipos[i]
            I = spec.body_inertia[i]
            full = f"{I[0,0]} {I[1,1]} {I[2,2]} {I[0,1]} {I[0,2]} {I[1,2]}"
            lines.append(f'{indent}  <inertial pos="{c[0]} {c[1]} {c[2]}" mass="{m}" fullinertia="{full}"/>')
        if spec.parents[i] == -1:
            lines.append(f'{indent}  <joint name="{name}" type="free" limited="false" armature="0" damping="0" stiffness="0"/>')
        else:
            dof0 = 3 * (i - 1)
            for k, suffix in enumerate("zyx"):
                ax = spec.joint_axes[i - 1, k]
                r = jr[dof0 + k]
                lines.append(
                    f'{indent}  <joint name="{name}_{suffix}" type="hinge" pos="0 0 0" '
                    f'axis="{ax[0]} {ax[1]} {ax[2]}" range="{r[0]} {r[1]}"/>'
                )
        lines.append(f'{indent}  <geom type="mesh" mesh="{name}" contype="0" conaffinity="1"/>')
        for c_idx in children.get(i, []):
            emit(c_idx, indent + "  ")
        lines.append(f'{indent}</body>')

    emit(0, "    ")

    if with_objects:
        for obj in spec.objects:
            lines.append(f'    <body name="{obj.name}" pos="0 0 0">')
            lines.append(f'      <joint name="{obj.name}" type="free" limited="false" armature="0" damping="0" stiffness="0"/>')
            for g in obj.geoms:
                size = " ".join(str(x) for x in g.size)
                q = g.quat
                lines.append(
                    f'      <geom contype="1" conaffinity="1" type="{g.gtype}" size="{size}" '
                    f'pos="{g.pos[0]} {g.pos[1]} {g.pos[2]}" quat="{q[0]} {q[1]} {q[2]} {q[3]}" '
                    f'condim="{g.condim}" mass="{g.mass}"/>'
                )
            lines.append('    </body>')

    lines += ['  </worldbody>', '  <actuator>']
    for i, name in enumerate(spec.body_names[1:], start=1):
        for suffix in "zyx":
            lines.append(f'    <motor name="{name}_{suffix}" joint="{name}_{suffix}" gear="1"/>')
    lines += ['  </actuator>', '</mujoco>']

    xml_path = os.path.join(out_dir, "humanoid_local.xml")
    with open(xml_path, "w") as f:
        f.write("\n".join(lines))
    return xml_path
