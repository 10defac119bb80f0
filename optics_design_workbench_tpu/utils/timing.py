'''
Timer and progress utilities (reference: freecad/optics_design_workbench/
timing.py:18-182 — IntervalTimer, FrequencyTimer, ProgressTracker, Condition).
'''

import time

from . import io


class IntervalTimer:
  '''Fires at most once per `interval` seconds; optional jitter fraction
  desynchronizes many workers (reference: timing.py:18).'''

  def __init__(self, interval, jitter=0., fireImmediately=False):
    self.interval = float(interval)
    self.jitter = float(jitter)
    self._next = time.time() if fireImmediately else time.time() + self._span()

  def _span(self):
    if self.jitter:
      import random
      return self.interval * (1 + self.jitter * (2 * random.random() - 1))
    return self.interval

  def check(self):
    '''Return True (and re-arm) if the interval elapsed.'''
    now = time.time()
    if now >= self._next:
      self._next = now + self._span()
      return True
    return False


class FrequencyTimer:
  '''Rate limiter that targets a given call frequency; `sleep()` blocks until
  the next slot (reference: timing.py:47).'''

  def __init__(self, frequency):
    self.period = 1. / float(frequency)
    self._last = None

  def sleep(self):
    now = time.time()
    if self._last is not None:
      wait = self._last + self.period - now
      if wait > 0:
        time.sleep(wait)
      elif wait < -5 * self.period:
        io.verb(f'FrequencyTimer fell behind by {-wait:.1f}s')
    self._last = time.time()


class ProgressTracker:
  '''Tracks progress towards a total and estimates the ETA
  (reference: timing.py:88).'''

  def __init__(self, total=None):
    self.total = total
    self.current = 0
    self._t0 = time.time()

  def update(self, current):
    self.current = current

  def increment(self, by=1):
    self.current += by

  def fraction(self):
    if not self.total:
      return None
    return min(1., self.current / self.total)

  def eta(self):
    '''Seconds until completion, or None if unknown.'''
    frac = self.fraction()
    if not frac:
      return None
    elapsed = time.time() - self._t0
    return elapsed * (1 - frac) / frac

  def __str__(self):
    if self.total:
      eta = self.eta()
      return (f'{self.current}/{self.total}'
              + (f' (ETA {io.secondsToStr(eta)})' if eta is not None else ''))
    return str(self.current)


class Condition:
  '''Time-windowed condition: `isTrueSince(seconds)` returns True only if the
  wrapped predicate has been continuously true for at least that long
  (reference: timing.py:139-181).'''

  def __init__(self, predicate):
    self.predicate = predicate
    self._trueSince = None

  def check(self):
    if self.predicate():
      if self._trueSince is None:
        self._trueSince = time.time()
      return True
    self._trueSince = None
    return False

  def isTrueSince(self, seconds):
    self.check()
    return self._trueSince is not None and time.time() - self._trueSince >= seconds
