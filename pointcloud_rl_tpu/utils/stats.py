"""Running statistics and interval triggers.

Covers the reference's pyrl/utils/math/{counting,running_stats}.py and the
EpisodicStatistics accumulator from pyrl/apis/train_rl.py, rebuilt for a
jax-first stack (all host-side numpy; cross-process reduction happens via
the parallel package, not here).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class EveryNSteps:
    """Fire once each time the step counter crosses a multiple of n."""

    def __init__(self, n: Optional[int]):
        self.n = n
        self.last = 0

    def reset(self, start: int = 0) -> None:
        self.last = start // self.n if self.n else 0

    def check(self, step: int) -> bool:
        if not self.n or self.n <= 0:
            return False
        if step // self.n > self.last:
            self.last = step // self.n
            return True
        return False

    def standard(self, step: int) -> int:
        """The canonical step of the most recent trigger (multiple of n)."""
        return (step // self.n) * self.n if self.n else step


class RunningMeanStd:
    """Welford-style running mean/var over batched observations."""

    def __init__(self, shape=(), clip_max: Optional[float] = None, eps: float = 1e-8):
        self.mean = np.zeros(shape, np.float64)
        self.var = np.ones(shape, np.float64)
        self.count = 0.0
        self.clip_max = clip_max
        self.eps = eps

    def update(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float64)
        batch_mean = x.mean(axis=0)
        batch_var = x.var(axis=0)
        batch_count = x.shape[0]
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + delta**2 * self.count * batch_count / tot
        self.mean, self.var, self.count = new_mean, m2 / tot, tot

    @property
    def std(self) -> np.ndarray:
        return np.sqrt(self.var + self.eps)

    def normalize(self, x: np.ndarray) -> np.ndarray:
        out = (np.asarray(x) - self.mean) / self.std
        if self.clip_max is not None:
            out = np.clip(out, -self.clip_max, self.clip_max)
        return out.astype(np.float32)


class MovingAverage:
    """Fixed-window moving average of scalars or vectors."""

    def __init__(self, window: int = 100):
        self.window = window
        self._items: List[float] = []

    def push(self, value: float) -> None:
        self._items.append(float(value))
        if len(self._items) > self.window:
            self._items.pop(0)

    @property
    def mean(self) -> float:
        return float(np.mean(self._items)) if self._items else 0.0

    def __len__(self) -> int:
        return len(self._items)


class EpisodicStatistics:
    """Per-worker running episode returns/lengths with min/mean/max summaries.

    Mirrors reference pyrl/apis/train_rl.py:15-110: rewards accumulate per env
    worker; on episode done the totals are pushed into history; ``get_stats``
    reduces the history since the last ``reset_history``.
    """

    def __init__(self, num_workers: int):
        self.num_workers = num_workers
        self.current_rewards = np.zeros(num_workers, np.float64)
        self.current_lens = np.zeros(num_workers, np.int64)
        self.current_max_reward = np.full(num_workers, -np.inf)
        self.history_rewards: List[float] = []
        self.history_lens: List[int] = []
        self.num_episodes = 0

    def push(self, rewards: np.ndarray, episode_dones: np.ndarray) -> int:
        """Accumulate one vec-env step; returns the number of episodes finished."""
        rewards = np.asarray(rewards).reshape(self.num_workers)
        dones = np.asarray(episode_dones).reshape(self.num_workers).astype(bool)
        self.current_rewards += rewards
        self.current_lens += 1
        self.current_max_reward = np.maximum(self.current_max_reward, rewards)
        n_done = int(dones.sum())
        if n_done:
            for i in np.nonzero(dones)[0]:
                self.history_rewards.append(float(self.current_rewards[i]))
                self.history_lens.append(int(self.current_lens[i]))
            self.current_rewards[dones] = 0
            self.current_lens[dones] = 0
            self.current_max_reward[dones] = -np.inf
            self.num_episodes += n_done
        return n_done

    def push_single(self, worker: int, reward: float, episode_done: bool) -> int:
        """Accumulate one transition for one worker (warm-up batches)."""
        self.current_rewards[worker] += reward
        self.current_lens[worker] += 1
        self.current_max_reward[worker] = max(self.current_max_reward[worker], reward)
        if episode_done:
            self.history_rewards.append(float(self.current_rewards[worker]))
            self.history_lens.append(int(self.current_lens[worker]))
            self.current_rewards[worker] = 0
            self.current_lens[worker] = 0
            self.current_max_reward[worker] = -np.inf
            self.num_episodes += 1
            return 1
        return 0

    def reset_history(self) -> None:
        self.history_rewards.clear()
        self.history_lens.clear()

    def reset_current(self) -> None:
        self.current_rewards[:] = 0
        self.current_lens[:] = 0
        self.current_max_reward[:] = -np.inf

    def get_stats(self) -> Dict[str, float]:
        r = np.asarray(self.history_rewards if self.history_rewards else [0.0])
        l = np.asarray(self.history_lens if self.history_lens else [0])
        return {
            "env/rewards_mean": float(r.mean()),
            "env/rewards_min": float(r.min()),
            "env/rewards_max": float(r.max()),
            "env/episode_length": float(l.mean()),
            "env/num_episodes": float(len(self.history_rewards)),
        }


def split_num(total: int, parts: int) -> List[int]:
    """Split ``total`` into ``parts`` near-equal integers (front-loaded)."""
    base, rem = divmod(total, parts)
    return [base + (1 if i < rem else 0) for i in range(parts)]
