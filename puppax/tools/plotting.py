"""Gait analysis and plotting (host-side, eval only).

Parity with /root/reference/pupperv3_mjx/plotting.py:8-62: interactive
multi-series time plots and the Hilbert transform (amplitude envelope /
instantaneous frequency / phase) used to analyze gait periodicity. The
Hilbert analytic signal is computed with a plain FFT so no scipy is
required; plotting backends (plotly, matplotlib) are optional imports.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def hilbert_transform(
    data: np.ndarray, dt: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Amplitude envelope, instantaneous frequency (Hz), and phase of a
    real signal via the analytic signal (reference plotting.py:45-62).

    Accepts (T,) or (T, C); returns arrays of matching shape (frequency has
    length T-1 on the time axis).
    """
    data = np.asarray(data, np.float64)
    n = data.shape[0]
    spectrum = np.fft.fft(data, axis=0)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    if data.ndim > 1:
        h = h.reshape((n,) + (1,) * (data.ndim - 1))
    analytic = np.fft.ifft(spectrum * h, axis=0)

    amplitude_envelope = np.abs(analytic)
    instantaneous_phase = np.unwrap(np.angle(analytic), axis=0)
    instantaneous_frequency = np.diff(instantaneous_phase, axis=0) / (
        2.0 * np.pi * dt
    )
    return amplitude_envelope, instantaneous_frequency, instantaneous_phase


def plot_multi_series(
    series: Dict[str, np.ndarray],
    dt: float,
    title: str = "",
    ylabel: str = "",
    backend: Optional[str] = None,
):
    """Plot named time series on one time axis (reference plotting.py:8-43).

    backend: 'plotly' | 'matplotlib' | None (auto: first available).
    Returns the figure object, or None if no plotting backend exists.
    """
    first = next(iter(series.values()))
    t = np.arange(np.asarray(first).shape[0]) * dt

    if backend in (None, "plotly"):
        try:
            import plotly.graph_objects as go

            fig = go.Figure()
            for name, values in series.items():
                values = np.asarray(values)
                if values.ndim == 1:
                    fig.add_trace(go.Scatter(x=t, y=values, name=name))
                else:
                    for c in range(values.shape[1]):
                        fig.add_trace(
                            go.Scatter(x=t, y=values[:, c], name=f"{name}[{c}]")
                        )
            fig.update_layout(
                title=title, xaxis_title="time [s]", yaxis_title=ylabel
            )
            return fig
        except ImportError:
            if backend == "plotly":
                raise

    try:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for name, values in series.items():
            values = np.asarray(values)
            if values.ndim == 1:
                ax.plot(t, values, label=name)
            else:
                for c in range(values.shape[1]):
                    ax.plot(t, values[:, c], label=f"{name}[{c}]")
        ax.set_title(title)
        ax.set_xlabel("time [s]")
        ax.set_ylabel(ylabel)
        ax.legend()
        return fig
    except ImportError:
        return None
