"""Electrodes: sources, receivers, and their geometry.

TPU-native rebuild of the reference's emg3d/electrodes.py:42-872.  All of
this is host-side setup geometry (numpy); the resulting source vectors are
what enters the jitted compute path.

Class hierarchy (mirroring the reference):

    Wire ── Point ──┬─ TxElectricPoint / TxMagneticPoint (+ Source)
            │       └─ RxElectricPoint / RxMagneticPoint (+ Receiver)
            Dipole ─── TxElectricDipole / TxMagneticDipole (+ Source)
            Wire ───── TxElectricWire (+ Source)
"""

from copy import deepcopy

import numpy as np
import scipy as sp

from emg3d_tpu import utils

__all__ = [
    "TxElectricPoint", "TxMagneticPoint", "TxElectricDipole",
    "TxMagneticDipole", "TxElectricWire", "RxElectricPoint",
    "RxMagneticPoint", "rotation", "point_to_dipole", "dipole_to_point",
    "point_to_square_loop",
]


def __dir__():
    return __all__


class Wire:
    """An arbitrary number of electrodes connected in series.

    Reference: emg3d/electrodes.py:42-205.
    """

    _serialize = {"coordinates"}

    def __init__(self, coordinates):
        self._points = np.asarray(np.atleast_2d(coordinates), dtype=float)
        if not (self._points.ndim == 2 and self._points.shape[1] == 3):
            raise ValueError(
                "`coordinates` must be of shape (x, 3), provided: "
                f"{coordinates}")

    def __eq__(self, electrode):
        equal = self.__class__.__name__ == electrode.__class__.__name__
        if equal:
            for name in self._serialize:
                comp = getattr(self, name)
                other = getattr(electrode, name)
                if isinstance(comp, np.ndarray):
                    equal *= np.allclose(comp, other)
                else:
                    equal *= comp == other
        return bool(equal)

    def __repr__(self):
        add = getattr(self, "_repr_add", "")
        s0 = f"{self.__class__.__name__}: {add}\n"
        s1 = (f"    center={{{self.center[0]:,.1f}; "
              f"{self.center[1]:,.1f}; {self.center[2]:,.1f}}} m; ")
        s2 = f"n={self.segment_n}; l={self.length:,.1f} m"
        return s0 + s1 + s2 if len(s1 + s2) < 80 else s0 + s1 + "\n    " + s2

    def copy(self):
        """Return a copy of the electrode."""
        return self.from_dict(self.to_dict(True))

    def to_dict(self, copy=False):
        """Store the necessary information in a dict."""
        out = {"__class__": self.__class__.__name__,
               **{prop: getattr(self, prop) for prop in self._serialize}}
        return deepcopy(out) if copy else out

    @classmethod
    def from_dict(cls, inp):
        """Re-create the electrode from a dict as given by ``to_dict``."""
        return cls(**{k: v for k, v in inp.items() if k != "__class__"})

    @property
    def points(self):
        """Electrode locations (n, 3)."""
        return self._points

    @property
    def coordinates(self):
        """Electrode coordinates as accepted by its class."""
        return getattr(self, "_coordinates", self._points)

    @property
    def xtype(self):
        """'electric' or 'magnetic' (idealized-dipole flag)."""
        if not hasattr(self, "_xtype"):
            self._xtype = ("magnetic" if "Magnetic" in
                           self.__class__.__name__ else "electric")
        return self._xtype

    @property
    def center(self):
        """Center point of all unique electrodes."""
        if not hasattr(self, "_center"):
            self._center = np.unique(self.points, axis=0).mean(axis=0)
        return self._center

    @property
    def length(self):
        """Total length of all dipole segments."""
        if not hasattr(self, "_length"):
            lengths = np.linalg.norm(np.diff(self.points, axis=0), axis=1)
            self._segment_lengths = lengths
            self._length = lengths.sum()
        return self._length

    @property
    def segment_lengths(self):
        """Length of each individual dipole segment."""
        _ = self.length
        return self._segment_lengths

    @property
    def segment_n(self):
        """Number of dipole segments."""
        return len(self.segment_lengths)

    @property
    def _prefix(self):
        """Prefix for survey dict keys, e.g. TxED for TxElectricDipole."""
        name = self.__class__.__name__
        return name[:2] + "".join(c for c in name if c.isupper())[1:]


class Point(Wire):
    """A point electrode: (x, y, z, azimuth, elevation).

    Reference: emg3d/electrodes.py:208-262.
    """

    def __init__(self, coordinates):
        if len(coordinates) != 5:
            raise ValueError(
                "Point coordinates must be defined as (x, y, z, azimuth, "
                f"elevation). Provided coordinates: {coordinates}.")
        self._coordinates = np.asarray(
            coordinates, dtype=np.float64).squeeze()
        super().__init__(coordinates[:3])

    def __repr__(self):
        add = getattr(self, "_repr_add", "")
        s0 = f"{self.__class__.__name__}: {add}\n"
        s1 = (f"    x={self.center[0]:,.1f} m, y={self.center[1]:,.1f} m, "
              f"z={self.center[2]:,.1f} m, ")
        s2 = f"θ={self.azimuth:.1f}°, φ={self.elevation:.1f}°"
        return s0 + s1 + s2 if len(s1 + s2) < 80 else s0 + s1 + "\n    " + s2

    @property
    def azimuth(self):
        """Anticlockwise rotation (°) from x-axis towards y-axis."""
        return self._coordinates[3]

    @property
    def elevation(self):
        """Anticlockwise (upwards) rotation (°) from the xy-plane."""
        return self._coordinates[4]


class Dipole(Wire):
    """A dipole: two electrodes on a straight line.

    Three accepted coordinate formats (emg3d/electrodes.py:264-413):
    ``[[x1,y1,z1],[x2,y2,z2]]``, ``(x1,x2,y1,y2,z1,z2)``, or
    ``(x,y,z,azimuth,elevation)`` with ``length``.  Magnetic dipoles are
    represented internally as a square loop perpendicular to the dipole.
    """

    def __init__(self, coordinates, length=1.0):
        coordinates = np.asarray(coordinates, dtype=np.float64).squeeze()
        is_point = coordinates.shape == (5,)
        is_flat = coordinates.shape == (6,)
        is_dipole = coordinates.shape == (2, 3)

        if is_point:
            self._serialize = {"length"} | self._serialize
            if self.xtype == "magnetic":
                points = point_to_square_loop(coordinates, length)
            else:
                points = point_to_dipole(coordinates, length)
            self._length = length
            self._coordinates = coordinates

        elif is_flat or is_dipole:
            if is_flat:
                points = coordinates.reshape((2, 3), order="F")
                self._coordinates = coordinates
            else:
                points = coordinates

            if self.xtype == "magnetic":
                azimuth, elevation, length = dipole_to_point(points)
                center = tuple(np.sum(points, 0) / 2)
                points = point_to_square_loop(
                    (*center, azimuth, elevation), length)
                self._coordinates = coordinates

            if np.allclose(points[0, :], points[1, :]):
                raise ValueError(
                    "The two electrodes are identical, use the format "
                    "(x, y, z, azimuth, elevation) instead. "
                    f"Provided coordinates: {coordinates}.")

        else:
            raise ValueError(
                "Dipole coordinates must be a point "
                "(x, y, z, azimuth, elevation) or two points "
                "(x1, x2, y1, y2, z1, z2) / [[x1, y1, z1], [x2, y2, z2]]. "
                f"Provided coordinates: {coordinates}.")

        super().__init__(points)

    def __repr__(self):
        add = getattr(self, "_repr_add", "")
        s0 = f"{self.__class__.__name__}: {add}\n"
        if self.coordinates.size == 5:
            s1 = (f"    center={{{self.center[0]:,.1f}; "
                  f"{self.center[1]:,.1f}; {self.center[2]:,.1f}}} m; ")
            s2 = (f"θ={self.azimuth:.1f}°, φ={self.elevation:.1f}°; "
                  f"l={self.length:,.1f} m")
        else:
            if self.xtype == "magnetic":
                points = np.ravel(self.coordinates, order="F")
            else:
                points = self.points.ravel("F")
            s1 = (f"    e1={{{points[0]:,.1f}; {points[2]:,.1f}; "
                  f"{points[4]:,.1f}}} m; ")
            s2 = (f"e2={{{points[1]:,.1f}; {points[3]:,.1f}; "
                  f"{points[5]:,.1f}}} m")
        return s0 + s1 + s2 if len(s1 + s2) < 80 else s0 + s1 + "\n    " + s2

    @property
    def azimuth(self):
        """Anticlockwise rotation (°) from x-axis towards y-axis."""
        if not hasattr(self, "_azimuth"):
            if len(self.coordinates) == 5:
                out = self._coordinates[3:]
            else:
                out = dipole_to_point(self._points)[:2]
            self._azimuth, self._elevation = out
        return self._azimuth

    @property
    def elevation(self):
        """Anticlockwise (upwards) rotation (°) from the xy-plane."""
        _ = self.azimuth
        return self._elevation


class Source(Wire):
    """A wire with a source strength (reference: electrodes.py:415-449)."""

    _serialize = {"strength"} | Wire._serialize

    def __init__(self, strength, **kwargs):
        self._strength = strength
        self._repr_add = f"{self.strength:,.1f} A;"
        super().__init__(**kwargs)

    @property
    def strength(self):
        """Source strength (A)."""
        return self._strength

    def get_field(self, grid, frequency):
        """Return the source field for given grid and frequency."""
        from emg3d_tpu import fields
        return fields.get_source_field(grid, self, frequency)


@utils._known_class
class TxElectricPoint(Source, Point):
    """Electric point source; (x, y, z, azimuth, elevation)."""

    def __init__(self, coordinates, strength=1.0):
        super().__init__(coordinates=coordinates, strength=strength)


@utils._known_class
class TxMagneticPoint(Source, Point):
    """Magnetic point source (infinitesimal magnetic dipole)."""

    def __init__(self, coordinates, strength=1.0):
        super().__init__(coordinates=coordinates, strength=strength)


@utils._known_class
class TxElectricDipole(Source, Dipole):
    """Electric dipole source: two electrodes connected by a wire."""

    def __init__(self, coordinates, strength=1.0, length=1.0):
        super().__init__(coordinates=coordinates, strength=strength,
                         length=length)


@utils._known_class
class TxMagneticDipole(Source, Dipole):
    """Magnetic dipole source: square loop perpendicular to the dipole."""

    def __init__(self, coordinates, strength=1.0, length=1.0):
        super().__init__(coordinates=coordinates, strength=strength,
                         length=length)


@utils._known_class
class TxElectricWire(Source, Wire):
    """Electric wire source: a series of connected dipole segments."""

    def __init__(self, coordinates, strength=1.0):
        super().__init__(coordinates=coordinates, strength=strength)


class Receiver(Wire):
    """A receiver; absolute or relative-to-source positioning.

    Reference: emg3d/electrodes.py:594-660.
    """

    _serialize = {"relative", "data_type"} | Wire._serialize

    def __init__(self, relative, data_type, **kwargs):
        if data_type.lower() != "complex":
            raise ValueError(f"Unknown data type '{data_type}'.")
        self._relative = relative
        self._data_type = data_type.lower()
        self._repr_add = (
            f"{['absolute', 'relative'][int(self.relative)]}; "
            f"{self.data_type};")
        super().__init__(**kwargs)

    @property
    def relative(self):
        """True if coordinates are relative to the source center."""
        return self._relative

    @property
    def data_type(self):
        """Data type of the measured responses."""
        return self._data_type

    def center_abs(self, source):
        """Return the center as an absolute position."""
        if self.relative:
            return source.center + self.center
        return self.center

    def coordinates_abs(self, source):
        """Return the coordinates as absolute positions."""
        if not hasattr(self, "azimuth"):
            return self.center_abs(source)
        return (*self.center_abs(source), self.azimuth, self.elevation)


@utils._known_class
class RxElectricPoint(Receiver, Point):
    """Electric point receiver [V/m]."""

    def __init__(self, coordinates, relative=False, data_type="complex"):
        super().__init__(coordinates=coordinates, relative=relative,
                         data_type=data_type)


@utils._known_class
class RxMagneticPoint(Receiver, Point):
    """Magnetic point receiver [A/m]."""

    def __init__(self, coordinates, relative=False, data_type="complex"):
        super().__init__(coordinates=coordinates, relative=relative,
                         data_type=data_type)


# Adjoint sources for the adjoint-state gradient
# (reference: emg3d/electrodes.py:683,715).
RxElectricPoint._adjoint_source = TxElectricPoint
RxMagneticPoint._adjoint_source = TxMagneticPoint


# -------------------------------------------------------------------------
# Geometry helpers (reference: emg3d/electrodes.py:726-872).
# -------------------------------------------------------------------------

def point_to_dipole(point, length, deg=True):
    """Dipole endpoints from center point, angles, and length."""
    xyz = rotation(point[3], point[4], deg=deg) * length / 2
    return point[:3] + np.array([-xyz, xyz])


def dipole_to_point(dipole, deg=True):
    """Azimuth, elevation, and length of an electrode pair."""
    dx, dy, dz = np.diff(dipole.T).squeeze()
    length = np.linalg.norm([dx, dy, dz])
    azimuth = np.angle(dx + 1j * dy, deg=deg)
    elevation = np.angle(np.sqrt(dx ** 2 + dy ** 2) + 1j * dz, deg=deg)
    return azimuth, elevation, length


def point_to_square_loop(source, area):
    """Closed square loop of given area, perpendicular to the source dipole.

    Returns five points (closed rectangle).
    """
    half_diag = np.sqrt(area / 2)
    xyz_hor = rotation(source[3] + 90.0, 0.0) * half_diag
    xyz_ver = rotation(source[3], source[4] + 90.0) * half_diag
    return source[:3] + np.stack(
        [xyz_hor, xyz_ver, -xyz_hor, -xyz_ver, xyz_hor])


def rotation(azimuth, elevation, deg=True):
    """Rotation factors for a RHS coordinate system with positive z upwards.

    azimuth: anticlockwise from x towards y; elevation: upwards from the
    xy-plane towards z (reference: emg3d/electrodes.py:825-872).
    """
    if deg:
        cos, sin = sp.special.cosdg, sp.special.sindg
    else:
        cos, sin = np.cos, np.sin
    return np.array([cos(azimuth) * cos(elevation),
                     sin(azimuth) * cos(elevation),
                     sin(elevation)])
