"""Core pytree types of the batched physics engine.

Design: a compiled ``Model`` is the TPU-native analogue of ``mujoco.MjModel``
(reference: gymnasium_robotics/envs/robot_env.py:292-303 loads MjModel per env
object; here one frozen Model is shared by an arbitrarily large batch of
``Data`` states). All *structural* information (sizes, tree topology, joint
types, precomputed collision pair tables) lives in hashable static metadata so
that jitted step functions specialize on it at trace time; all *numeric*
quantities are device arrays and may be batched.

``Data`` is the analogue of ``mujoco.MjData``: a pure pytree, so env state is
trivially checkpointable (SURVEY.md §5: checkpoint = save the pytree) and maps
cleanly onto ``vmap``/``pjit`` sharding over the leading batch axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import numpy as np


def _register(cls):
    """Register a dataclass as a pytree: fields named in ``_meta`` are static."""
    meta = getattr(cls, "_meta", ())
    fields = [f.name for f in dataclasses.fields(cls)]
    data_fields = [f for f in fields if f not in meta]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta)
    )
    return cls


# Joint types (match MuJoCo's mjtJoint so imported models keep their codes)
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3
# Geom types (match mjtGeom)
PLANE, HFIELD, SPHERE, CAPSULE, ELLIPSOID, CYLINDER, BOX, MESH = range(8)
# Equality constraint types (match mjtEq)
EQ_CONNECT, EQ_WELD, EQ_JOINT, EQ_TENDON = 0, 1, 2, 3
# Integrators
EULER, RK4, IMPLICITFAST = 0, 1, 2
# Condim-grouped constraint row kinds (internal)
JNT_QPOS_WIDTH = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
JNT_DOF_WIDTH = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}


@dataclasses.dataclass(frozen=True)
class Option:
    """Simulation options (mirrors the subset of mjOption the engine honors)."""

    timestep: float = 0.002
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    iterations: int = 20
    ls_iterations: int = 10
    tolerance: float = 1e-8
    impratio: float = 1.0
    integrator: int = EULER
    density: float = 0.0
    viscosity: float = 0.0
    # max simultaneously active contact slots per condim group (0 = no cap);
    # the TPU-native bound on nefc for scenes with large static pair tables
    contact_cap: int = 0
    # pair-level top-K dynamic broadphase (0 = off): candidate groups larger
    # than this evaluate narrowphase only on the K nearest pairs per env
    # (ranked by world-AABB gap minus margin). The contact table becomes
    # COMPACT (sum of K_g * slots_g) and Contact.src carries each compact
    # slot's canonical static slot id (traced per env for pruned groups).
    # Replaces MuJoCo's sweep-and-prune broadphase (mj_collision) with a
    # shape-static TPU equivalent. K is calibrated per family against
    # C-engine rollouts (tools/calibrate_topk.py): the selection is exact
    # when <= K pairs per group have world-AABB gap below margin
    # simultaneously (the rank key is the AABB gap — a lower bound on
    # geom distance — so overlapping-AABB-but-separated pairs count
    # against K; that conservative criterion is what calibrate_topk.py
    # measures).
    pair_topk: int = 0
    # one-dispatch pallas narrowphase megakernel + K-round-argmin top-K
    # selection (narrowphase_pallas.py): every candidate group's contact
    # formula runs inside ONE pallas program per lane block instead of ~30
    # separate XLA op chains, and the broadphase top-K avoids the lane-axis
    # sort (kitchen B=512: 563 -> 716 env-steps/s). "auto" = TPU only,
    # "force" = always (interpret mode off-TPU, for tests), False = off.
    # Applies to the pair-topk pruned core.
    narrowphase_kernel: Any = "auto"
    # how the pruned narrowphase materializes per-lane selected geom state:
    # "gather" = take/take_along_axis (per-lane dynamic-slice), "onehot" =
    # one-hot matmul over the geom/hull table axis (runs on the MXU; TPU
    # per-lane gathers can serialize — tools/tpu_gather_probe.py measures
    # the crossover). Numerically identical (0/1 weights, einsums pinned to
    # HIGHEST precision). "auto" (default) = onehot on TPU while mesh groups
    # route to XLA (the MPR hybrid — always, with mpr="auto"), since onehot
    # hull tables feeding the megakernel is catastrophic (r5 matrix:
    # AntMaze 6x slower); see collision_vec.use_onehot.
    gather_mode: str = "auto"
    # fused pallas Newton solver for small systems (nv==2); "auto" enables it
    # on TPU backends only, True forces (interpret-mode on CPU), False = off
    fused_solver: str = "auto"
    # batch-last (SoA) substep pipeline (physics/soa.py): the whole substep
    # runs with the env batch on the TPU lane axis. "auto" = on TPU only,
    # True/"force" = always (CPU testing), False = off
    soa: Any = "auto"
    # Minkowski Portal Refinement upgrade for convex pairs (physics/mpr.py):
    # recovers exact penetration depth/axis for edge-edge witness features
    # the face-SAT narrowphase approximates (box-hull and hull-hull groups).
    # The reference reaches the same algorithm family through MuJoCo's convex
    # collider (libccd MPR) inside mj_step. "auto" = ON everywhere (round 5):
    # post-pair-topk hull groups are tiny and the TPU cost is zero with the
    # hybrid megakernel routing (collision_vec.use_mpr_xla), so CPU and TPU
    # run the SAME contact model. False = face-SAT approximation only
    # (divergence bounded by test_mpr_off_drift_bound).
    mpr: Any = "auto"
    # pallas FK kernel (physics/kinematics_pallas.py): bitwise-equal to the
    # XLA tree pass; measured a wash inside the substep scan on the current
    # stack (the XLA pass's true marginal cost is ~1 ms at B=2048 once the
    # fixed per-dispatch overhead is subtracted), so default off until the
    # in-scan A/B favors it. True/"force" = on, "auto" = TPU only.
    fk_kernel: Any = False
    # pointer-jumping FK in the SoA pipeline (soa._kinematics_jump): local
    # transforms for ALL bodies in one vectorized pass, then world poses by
    # 2^k ancestor doubling — ceil(log2(depth)) compositions instead of a
    # sequential per-level walk (kitchen kin trace 4,456 -> 1,736 eqns).
    # Same math modulo f32 reordering; "auto" (default) = on whenever the
    # topology qualifies (soa._JumpPlan.ok), False = sequential level pass.
    fk_jump: Any = "auto"
    # Compute per-body contact wrenches (Data.cfrc_ext, mj_rnePostConstraint
    # analogue). Only locomotion observations/costs read them (Ant v5,
    # Humanoid); the decode is two (ncon, B)-indexed scatter-adds — among
    # the most expensive single ops on TPU — so contact-rich families that
    # never read cfrc_ext turn this off (kitchen decode: ~14 ms -> ~2 ms at
    # B=512). Data.cfrc_ext stays present (zeros) either way.
    need_cfrc_ext: bool = True
    # contact-frame force decode (Data.con_force): "auto" computes it only
    # when the model has touch sensors (their sole in-pipeline consumer,
    # physics/sensor.py) or need_cfrc_ext is set; True forces it for users
    # reading Data.con_force directly (mj_contactForce analogue).
    need_con_force: Any = "auto"
    # packed-slot decode in soa.build_rows' traced contact path: ONE int
    # gather + one-hot unpack over tiny unique tables replaces ~7 per-lane
    # gathers per condim group (see soa._SlotPack). "auto" = TPU only;
    # orthogonal to gather_mode (which governs the narrowphase).
    slot_pack: Any = "auto"
    # disable flags
    disable_contact: bool = False
    disable_gravity: bool = False
    disable_limit: bool = False
    disable_equality: bool = False
    disable_clampctrl: bool = False


@dataclasses.dataclass(frozen=True)
class Meta:
    """Hashable structural metadata. All tuple-typed; computed at import time.

    Tuples (not numpy arrays) keep the object hashable so jit can specialize.
    """

    nq: int
    nv: int
    nu: int
    na: int
    nbody: int
    njnt: int
    ngeom: int
    nsite: int
    neq: int
    nmocap: int
    ntendon: int
    nwrap: int
    nsensor: int
    nsensordata: int

    opt: Option

    # topology
    body_parentid: Tuple[int, ...]
    body_rootid: Tuple[int, ...]
    body_jntadr: Tuple[int, ...]
    body_jntnum: Tuple[int, ...]
    body_dofadr: Tuple[int, ...]
    body_dofnum: Tuple[int, ...]
    body_mocapid: Tuple[int, ...]
    body_weldid: Tuple[int, ...]
    levels: Tuple[Tuple[int, ...], ...]  # bodies grouped by tree depth (level 0 = world)

    jnt_type: Tuple[int, ...]
    jnt_qposadr: Tuple[int, ...]
    jnt_dofadr: Tuple[int, ...]
    jnt_bodyid: Tuple[int, ...]
    jnt_limited: Tuple[int, ...]
    jnt_actfrclimited: Tuple[int, ...]

    dof_bodyid: Tuple[int, ...]
    dof_jntid: Tuple[int, ...]
    dof_parentid: Tuple[int, ...]

    geom_type: Tuple[int, ...]
    geom_bodyid: Tuple[int, ...]
    geom_condim: Tuple[int, ...]
    geom_priority: Tuple[int, ...]

    site_bodyid: Tuple[int, ...]

    eq_type: Tuple[int, ...]
    eq_obj1id: Tuple[int, ...]
    eq_obj2id: Tuple[int, ...]
    eq_active0: Tuple[int, ...]

    actuator_trntype: Tuple[int, ...]
    actuator_trnid: Tuple[int, ...]  # first trnid entry per actuator
    actuator_gaintype: Tuple[int, ...]
    actuator_biastype: Tuple[int, ...]
    actuator_dyntype: Tuple[int, ...]
    actuator_ctrllimited: Tuple[int, ...]
    actuator_forcelimited: Tuple[int, ...]
    actuator_actadr: Tuple[int, ...]
    actuator_actnum: Tuple[int, ...]

    tendon_adr: Tuple[int, ...]
    tendon_num: Tuple[int, ...]
    tendon_limited: Tuple[int, ...]
    wrap_objid: Tuple[int, ...]  # joint id (fixed) / site id (spatial) per wrap

    sensor_type: Tuple[int, ...]
    sensor_objid: Tuple[int, ...]
    sensor_adr: Tuple[int, ...]
    sensor_dim: Tuple[int, ...]

    # static collision candidate pairs: (geom1, geom2) sorted by type pair
    pairs: Tuple[Tuple[int, int], ...]
    con_condim: Tuple[int, ...] = ()  # condim per contact slot
    tendon_kind: Tuple[str, ...] = ()  # 'fixed' | 'spatial2' (per tendon)
    site_type: Tuple[int, ...] = ()  # mjtGeom per site (touch-sensor zones)

    # static facts precomputed at import
    has_damping: bool = False

    # convex-hull index per geom (-1 for non-mesh geoms); hull vertex/face
    # arrays live in Model.hull_vert / hull_face
    geom_hullid: Tuple[int, ...] = ()

    # names for host-side lookup (never used inside jit)
    body_names: Tuple[str, ...] = ()
    joint_names: Tuple[str, ...] = ()
    geom_names: Tuple[str, ...] = ()
    site_names: Tuple[str, ...] = ()
    actuator_names: Tuple[str, ...] = ()
    sensor_names: Tuple[str, ...] = ()
    tendon_names: Tuple[str, ...] = ()


class FrozenNp:
    """Identity-hashed bundle of host numpy tables riding a pytree's STATIC
    axis (meta_fields). Carries concrete model constants into code that only
    sees traced Model leaves (the pallas FK kernel unrolls joint math with
    these values embedded as immediates). Identity equality is correct here:
    a Model instance's tables never mutate, and a fresh Model (new import)
    should retrace anyway."""

    __slots__ = ("tables",)

    def __init__(self, tables: dict):
        self.tables = tables

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@_register
@dataclasses.dataclass
class Model:
    """Compiled model: static Meta + numeric device arrays."""

    _meta = ("meta", "fk_np")
    meta: Meta

    qpos0: Any
    qpos_spring: Any

    body_pos: Any        # (nbody, 3)
    body_quat: Any       # (nbody, 4)
    body_ipos: Any       # (nbody, 3)
    body_iquat: Any      # (nbody, 4)
    body_mass: Any       # (nbody,)
    body_subtreemass: Any
    body_inertia: Any    # (nbody, 3)
    body_invweight0: Any  # (nbody, 2)

    jnt_pos: Any         # (njnt, 3)
    jnt_axis: Any        # (njnt, 3)
    jnt_range: Any       # (njnt, 2)
    jnt_stiffness: Any   # (njnt,)
    jnt_margin: Any      # (njnt,)
    jnt_solref: Any      # (njnt, 2)
    jnt_solimp: Any      # (njnt, 5)

    dof_armature: Any    # (nv,)
    dof_damping: Any     # (nv,)
    dof_frictionloss: Any  # (nv,)
    dof_invweight0: Any  # (nv,)
    dof_solref: Any      # (nv, 2) friction loss
    dof_solimp: Any      # (nv, 5)

    geom_pos: Any        # (ngeom, 3)
    geom_quat: Any       # (ngeom, 4)
    geom_size: Any       # (ngeom, 3)
    geom_friction: Any   # (ngeom, 3)
    geom_margin: Any     # (ngeom,)
    geom_gap: Any        # (ngeom,)
    geom_solref: Any     # (ngeom, 2)
    geom_solimp: Any     # (ngeom, 5)
    geom_solmix: Any     # (ngeom,)
    geom_rbound: Any     # (ngeom,)

    site_pos: Any        # (nsite, 3)
    site_quat: Any       # (nsite, 4)
    site_size_arr: Any   # (nsite, 3)

    eq_data: Any         # (neq, 11)
    eq_solref: Any       # (neq, 2)
    eq_solimp: Any       # (neq, 5)

    actuator_gear: Any       # (nu, 6)
    actuator_ctrlrange: Any  # (nu, 2)
    actuator_forcerange: Any # (nu, 2)
    actuator_actrange: Any   # (nu, 2)
    actuator_gainprm: Any    # (nu, 10)
    actuator_biasprm: Any    # (nu, 10)
    actuator_dynprm: Any     # (nu, 10)

    tendon_range: Any        # (ntendon, 2)
    tendon_stiffness: Any
    tendon_damping: Any
    tendon_lengthspring: Any  # (ntendon, 2)
    tendon_invweight0: Any
    tendon_solref_lim: Any
    tendon_solimp_lim: Any
    tendon_margin: Any
    wrap_prm: Any            # (nwrap,) coefficient per wrap entry

    # visual-only (rendering): rgba per geom; None on pre-r2 compiled assets
    geom_rgba: Any = None         # (ngeom, 4)

    # convex hulls for MESH geoms (static-feature SAT narrowphase): verts in
    # the geom frame (padded by repeating), faces as halfspaces (n, d) with
    # signed distance n.x + d (padding rows have d = -1e10 so they never win)
    hull_vert: Any = None         # (nhull, HULL_V, 3)
    hull_face: Any = None         # (nhull, HULL_F, 4)

    # per-contact-slot mixed params (aligned with collision slot order)
    con_friction: Any = None      # (ncon, 5)
    con_solref: Any = None        # (ncon, 2)
    con_solimp: Any = None        # (ncon, 5)
    con_includemargin: Any = None # (ncon,)

    # STATIC (meta_fields) bundle of concrete host-numpy copies of the FK
    # constants (body_pos/quat, jnt_pos/axis, qpos0, geom/site frames) for
    # the pallas FK kernel; set by soa._model_to_soa from the un-traced
    # model, None otherwise. Never serialized.
    fk_np: Any = None

    @property
    def nq(self):
        return self.meta.nq

    @property
    def nv(self):
        return self.meta.nv

    @property
    def nu(self):
        return self.meta.nu

    @property
    def opt(self):
        return self.meta.opt

    def name2id(self, kind: str, name: str) -> int:
        names = getattr(self.meta, f"{kind}_names")
        return names.index(name)

    def with_options(self, **kw) -> "Model":
        """Return a copy with simulation Option fields overridden (e.g.
        contact_cap, iterations)."""
        opt = dataclasses.replace(self.meta.opt, **kw)
        return dataclasses.replace(self, meta=dataclasses.replace(self.meta, opt=opt))


@_register
@dataclasses.dataclass
class Contact:
    """Fixed-size batched contact set (one slot per static candidate pair point)."""

    dist: Any      # (ncon,)
    pos: Any       # (ncon, 3)
    frame: Any     # (ncon, 3, 3) rows: normal, tan1, tan2
    geom1: Any     # (ncon,) int
    geom2: Any     # (ncon,) int
    # canonical static slot id per compact slot (pair_topk pruning only;
    # None when the contact table is the full static table). Traced per env:
    # per-slot model params (con_solref/solimp/friction/includemargin) and
    # slot geoms are gathered through it.
    src: Any = None  # (ncon_c,) int32 | None


@_register
@dataclasses.dataclass
class Data:
    """Simulation state + derived quantities. Leading dims may be batched."""

    # persistent state
    time: Any
    qpos: Any      # (nq,)
    qvel: Any      # (nv,)
    act: Any       # (na,)
    ctrl: Any      # (nu,)
    qfrc_applied: Any  # (nv,)
    mocap_pos: Any     # (nmocap, 3)
    mocap_quat: Any    # (nmocap, 4)
    eq_active: Any     # (neq,) bool

    # kinematics
    xpos: Any      # (nbody, 3)
    xquat: Any     # (nbody, 4)
    xmat: Any      # (nbody, 3, 3)
    xipos: Any     # (nbody, 3)
    ximat: Any     # (nbody, 3, 3)
    xanchor: Any   # (njnt, 3)
    xaxis: Any     # (njnt, 3)
    geom_xpos: Any # (ngeom, 3)
    geom_xmat: Any # (ngeom, 3, 3)
    site_xpos: Any # (nsite, 3)
    site_xmat: Any # (nsite, 3, 3)
    subtree_com: Any  # (nbody, 3)

    # com-based quantities
    cinert: Any    # (nbody, 10)
    cdof: Any      # (nv, 6)
    cvel: Any      # (nbody, 6)
    cdof_dot: Any  # (nv, 6)

    # tendons
    ten_length: Any  # (ntendon,)
    ten_velocity: Any
    ten_J: Any       # (ntendon, nv)

    # dynamics
    qM: Any            # (nv, nv) dense mass matrix
    qfrc_bias: Any     # (nv,)
    qfrc_passive: Any  # (nv,)
    qfrc_actuator: Any # (nv,)
    actuator_length: Any   # (nu,)
    actuator_velocity: Any # (nu,)
    actuator_force: Any    # (nu,)
    qfrc_smooth: Any   # (nv,)
    qacc_smooth: Any   # (nv,)
    qfrc_constraint: Any  # (nv,)
    qacc: Any          # (nv,)

    contact: Contact
    con_force: Any     # (ncon, 6) decoded contact-frame force per slot
    cfrc_ext: Any      # (nbody, 6) com-based external (contact+equality) wrench
    sensordata: Any    # (nsensordata,)
