"""Method of Moving Asymptotes (Svanberg 1987/2007).

Self-contained implementation of ``mmasub``/``subsolv`` (replacing the
reference's ``mmapy`` dependency, ref: optimization/MMA.py:1-71)
following Svanberg's published MATLAB reference algorithm ("MMA and
GCMMA — two methods for nonlinear optimization", 2007): moving
asymptotes with 1.2/0.7 adaptation, primal-dual Newton interior-point
subproblem solver.

The ``MMA`` wrapper class reproduces the reference loop exactly:
m=1 constraint, c=10⁴, ±0.1 move limits on top of bounds, objective
normalized by its first value, convergence on relative mean design
change (ref MMA.py:13-71).
"""

from __future__ import annotations

import logging

import numpy as np


def mmasub(m, n, iter, xval, xmin, xmax, xold1, xold2, f0val, df0dx, fval, dfdx,
           low, upp, a0, a, c, d, move=0.5, asyinit=0.5, asyincr=1.2,
           asydecr=0.7, albefa=0.1):
    """One MMA iteration (Svanberg's mmasub signature)."""
    epsimin = 1e-7
    raa0 = 1e-5
    eeen = np.ones((n, 1))
    eeem = np.ones((m, 1))

    # asymptotes
    if iter <= 2:
        low = xval - asyinit * (xmax - xmin)
        upp = xval + asyinit * (xmax - xmin)
    else:
        zzz = (xval - xold1) * (xold1 - xold2)
        factor = eeen.copy()
        factor[zzz > 0] = asyincr
        factor[zzz < 0] = asydecr
        low = xval - factor * (xold1 - low)
        upp = xval + factor * (upp - xold1)
        lowmin = xval - 10 * (xmax - xmin)
        lowmax = xval - 0.01 * (xmax - xmin)
        uppmin = xval + 0.01 * (xmax - xmin)
        uppmax = xval + 10 * (xmax - xmin)
        low = np.maximum(low, lowmin)
        low = np.minimum(low, lowmax)
        upp = np.minimum(upp, uppmax)
        upp = np.maximum(upp, uppmin)

    # bounds alfa, beta
    zzz1 = low + albefa * (xval - low)
    zzz2 = xval - move * (xmax - xmin)
    alfa = np.maximum(np.maximum(zzz1, zzz2), xmin)
    zzz1 = upp - albefa * (upp - xval)
    zzz2 = xval + move * (xmax - xmin)
    beta = np.minimum(np.minimum(zzz1, zzz2), xmax)

    # p0, q0, P, Q
    xmami = np.maximum(xmax - xmin, 1e-5 * eeen)
    xmamiinv = eeen / xmami
    ux1 = upp - xval
    ux2 = ux1 * ux1
    xl1 = xval - low
    xl2 = xl1 * xl1
    uxinv = eeen / ux1
    xlinv = eeen / xl1

    p0 = np.maximum(df0dx, 0)
    q0 = np.maximum(-df0dx, 0)
    pq0 = 0.001 * (p0 + q0) + raa0 * xmamiinv
    p0 = (p0 + pq0) * ux2
    q0 = (q0 + pq0) * xl2

    P = np.maximum(dfdx, 0)
    Q = np.maximum(-dfdx, 0)
    PQ = 0.001 * (P + Q) + raa0 * (eeem @ xmamiinv.T)
    P = (P + PQ) * (ux2.T)
    Q = (Q + PQ) * (xl2.T)
    b = P @ uxinv + Q @ xlinv - fval.reshape(m, 1)

    xmma, ymma, zmma, lam, xsi, eta, mu, zet, s = subsolv(
        m, n, epsimin, low, upp, alfa, beta, p0, q0, P, Q, a0, a, b, c, d)
    return xmma, ymma, zmma, lam, xsi, eta, mu, zet, s, low, upp


def subsolv(m, n, epsimin, low, upp, alfa, beta, p0, q0, P, Q, a0, a, b, c, d):
    """Primal-dual Newton solver for the MMA subproblem (Svanberg 2007)."""
    een = np.ones((n, 1))
    eem = np.ones((m, 1))
    epsi = 1.0
    x = 0.5 * (alfa + beta)
    y = eem.copy()
    z = np.array([[1.0]])
    lam = eem.copy()
    xsi = np.maximum(een / (x - alfa), een)
    eta = np.maximum(een / (beta - x), een)
    mu = np.maximum(eem, 0.5 * c)
    zet = np.array([[1.0]])
    s = eem.copy()

    while epsi > epsimin:
        epsvecn = epsi * een
        epsvecm = epsi * eem
        ux1 = upp - x
        xl1 = x - low
        ux2 = ux1 * ux1
        xl2 = xl1 * xl1
        uxinv1 = een / ux1
        xlinv1 = een / xl1
        plam = p0 + P.T @ lam
        qlam = q0 + Q.T @ lam
        gvec = P @ uxinv1 + Q @ xlinv1
        dpsidx = plam / ux2 - qlam / xl2
        rex = dpsidx - xsi + eta
        rey = c + d * y - mu - lam
        rez = a0 - zet - a.T @ lam
        relam = gvec - a * z - y + s - b
        rexsi = xsi * (x - alfa) - epsvecn
        reeta = eta * (beta - x) - epsvecn
        remu = mu * y - epsvecm
        rezet = zet * z - epsi
        res = lam * s - epsvecm
        residu1 = np.concatenate((rex, rey, rez), axis=0)
        residu2 = np.concatenate((relam, rexsi, reeta, remu, rezet, res), axis=0)
        residu = np.concatenate((residu1, residu2), axis=0)
        residunorm = np.sqrt((residu * residu).sum())
        residumax = np.max(np.abs(residu))

        ittt = 0
        while residumax > 0.9 * epsi and ittt < 200:
            ittt += 1
            ux1 = upp - x
            xl1 = x - low
            ux2 = ux1 * ux1
            xl2 = xl1 * xl1
            ux3 = ux1 * ux2
            xl3 = xl1 * xl2
            uxinv1 = een / ux1
            xlinv1 = een / xl1
            uxinv2 = een / ux2
            xlinv2 = een / xl2
            plam = p0 + P.T @ lam
            qlam = q0 + Q.T @ lam
            gvec = P @ uxinv1 + Q @ xlinv1
            GG = P * (uxinv2.T) - Q * (xlinv2.T)
            dpsidx = plam / ux2 - qlam / xl2
            delx = dpsidx - epsvecn / (x - alfa) + epsvecn / (beta - x)
            dely = c + d * y - lam - epsvecm / y
            delz = a0 - a.T @ lam - epsi / z
            dellam = gvec - a * z - y - b + epsvecm / lam
            diagx = plam / ux3 + qlam / xl3
            diagx = 2 * diagx + xsi / (x - alfa) + eta / (beta - x)
            diagxinv = een / diagx
            diagy = d + mu / y
            diagyinv = eem / diagy
            diaglam = s / lam
            diaglamyi = diaglam + diagyinv

            if m < n:
                blam = dellam + dely / diagy - GG @ (delx / diagx)
                bb = np.concatenate((blam, delz), axis=0)
                Alam = np.asarray(np.diag(diaglamyi.flatten())
                                  + (GG * diagxinv.T) @ GG.T)
                AAr1 = np.concatenate((Alam, a), axis=1)
                AAr2 = np.concatenate((a, -zet / z), axis=0).T
                AA = np.concatenate((AAr1, AAr2), axis=0)
                solut = np.linalg.solve(AA, bb)
                dlam = solut[0:m]
                dz = solut[m:m + 1]
                dx = -delx / diagx - (GG.T @ dlam) / diagx
            else:
                diaglamyiinv = eem / diaglamyi
                dellamyi = dellam + dely / diagy
                Axx = np.asarray(np.diag(diagx.flatten())
                                 + (GG.T * diaglamyiinv.T) @ GG)
                azz = zet / z + a.T @ (a / diaglamyi)
                axz = -GG.T @ (a / diaglamyi)
                bx = delx + GG.T @ (dellamyi / diaglamyi)
                bz = delz - a.T @ (dellamyi / diaglamyi)
                AAr1 = np.concatenate((Axx, axz), axis=1)
                AAr2 = np.concatenate((axz.T, azz), axis=1)
                AA = np.concatenate((AAr1, AAr2), axis=0)
                bb = np.concatenate((-bx, -bz), axis=0)
                solut = np.linalg.solve(AA, bb)
                dx = solut[0:n]
                dz = solut[n:n + 1]
                dlam = (GG @ dx) / diaglamyi - dz * (a / diaglamyi) \
                    + dellamyi / diaglamyi

            dy = -dely / diagy + dlam / diagy
            dxsi = -xsi + epsvecn / (x - alfa) - (xsi * dx) / (x - alfa)
            deta = -eta + epsvecn / (beta - x) + (eta * dx) / (beta - x)
            dmu = -mu + epsvecm / y - (mu * dy) / y
            dzet = -zet + epsi / z - zet * dz / z
            ds = -s + epsvecm / lam - (s * dlam) / lam
            xx = np.concatenate((y, z, lam, xsi, eta, mu, zet, s), axis=0)
            dxx = np.concatenate((dy, dz, dlam, dxsi, deta, dmu, dzet, ds), axis=0)

            stepxx = -1.01 * dxx / xx
            stmxx = np.max(stepxx)
            stepalfa = -1.01 * dx / (x - alfa)
            stmalfa = np.max(stepalfa)
            stepbeta = 1.01 * dx / (beta - x)
            stmbeta = np.max(stepbeta)
            stmalbe = max(stmalfa, stmbeta)
            stmalbexx = max(stmalbe, stmxx)
            stminv = max(stmalbexx, 1.0)
            steg = 1.0 / stminv

            xold = x.copy()
            yold = y.copy()
            zold = z.copy()
            lamold = lam.copy()
            xsiold = xsi.copy()
            etaold = eta.copy()
            muold = mu.copy()
            zetold = zet.copy()
            sold = s.copy()

            itto = 0
            resinew = 2 * residunorm
            while resinew > residunorm and itto < 50:
                itto += 1
                x = xold + steg * dx
                y = yold + steg * dy
                z = zold + steg * dz
                lam = lamold + steg * dlam
                xsi = xsiold + steg * dxsi
                eta = etaold + steg * deta
                mu = muold + steg * dmu
                zet = zetold + steg * dzet
                s = sold + steg * ds
                ux1 = upp - x
                xl1 = x - low
                ux2 = ux1 * ux1
                xl2 = xl1 * xl1
                uxinv1 = een / ux1
                xlinv1 = een / xl1
                plam = p0 + P.T @ lam
                qlam = q0 + Q.T @ lam
                gvec = P @ uxinv1 + Q @ xlinv1
                dpsidx = plam / ux2 - qlam / xl2
                rex = dpsidx - xsi + eta
                rey = c + d * y - mu - lam
                rez = a0 - zet - a.T @ lam
                relam = gvec - a * z - y + s - b
                rexsi = xsi * (x - alfa) - epsvecn
                reeta = eta * (beta - x) - epsvecn
                remu = mu * y - epsvecm
                rezet = zet * z - epsi
                res = lam * s - epsvecm
                residu1 = np.concatenate((rex, rey, rez), axis=0)
                residu2 = np.concatenate((relam, rexsi, reeta, remu, rezet, res), axis=0)
                residu = np.concatenate((residu1, residu2), axis=0)
                resinew = np.sqrt((residu * residu).sum())
                steg = steg / 2
            residunorm = resinew
            residumax = np.max(np.abs(residu))
            steg = 2 * steg
        epsi = 0.1 * epsi

    return x, y, z, lam, xsi, eta, mu, zet, s


class MMA:
    """Reference-compatible wrapper (ref: optimization/MMA.py:8-71)."""

    def __init__(self):
        self.logger = logging.getLogger(__name__)

    def minimize(self, x0, objective, constraint, bounds, options,
                 state=None, on_iteration=None):
        """``state``: dict from a previous run's ``on_iteration`` callback
        (loop/x/xold1/xold2/low/upp/C0) — continues the loop exactly
        where it stopped, preserving the moving-asymptote history.
        ``on_iteration(state_dict)``: called after every accepted design
        update so the caller can persist a resume snapshot."""
        bounds = np.array(bounds)
        x0 = np.asarray(x0, dtype=np.float64).reshape(-1, 1)
        m = 1
        n = len(x0)
        x = x0.copy()
        xold1 = x0.copy()
        xold2 = x0.copy()
        low = []
        upp = []
        # Svanberg sub-problem coefficients: a0 on the objective, and
        # per-constraint (a, c, d) — linear weight, slack penalty,
        # quadratic slack weight
        obj_weight = 1
        lin_weight = np.zeros((m, 1))
        slack_penalty = 10000 * np.ones((m, 1))
        slack_quad = np.zeros((m, 1))

        loop = 0
        C0 = None
        if state is not None:
            loop = int(state["loop"])
            x = np.asarray(state["x"], np.float64).reshape(-1, 1)
            xold1 = np.asarray(state["xold1"], np.float64).reshape(-1, 1)
            xold2 = np.asarray(state["xold2"], np.float64).reshape(-1, 1)
            # soft resume (state rebuilt from results.json, no snapshot):
            # low/upp absent -> the first resumed mmasub re-initializes
            # the asymptotes (identical to the iter<=2 branch)
            if "low" in state and np.size(state["low"]):
                low = np.asarray(state["low"], np.float64).reshape(-1, 1)
                upp = np.asarray(state["upp"], np.float64).reshape(-1, 1)
            C0 = float(state["C0"])
            self.logger.info("Resuming MMA from iteration %d", loop)
        damp_count = 0
        while True:
            loop += 1
            try:
                C, dC = objective(x)
            except Exception as e:
                from .fem import FEMSolveDiverged
                if not isinstance(e, FEMSolveDiverged):
                    raise
                # Mechanism-adjacent step: the candidate design pinched
                # a strut into a (near-)mechanism no solver level can
                # handle economically. Bisect back toward the last
                # ACCEPTED design and retry — by continuity a small
                # enough step from a solvable design stays solvable.
                # Four bisections shrink the step 16x; beyond that the
                # accepted design itself sits on the mechanism boundary
                # and the run ends gracefully (driver catches).
                if damp_count >= 4 or loop <= 1:
                    raise
                damp_count += 1
                loop -= 1
                self.logger.warning(
                    "FEM diverged at the proposed step — bisecting back "
                    "toward the last accepted design (retry %d/4)",
                    damp_count)
                x = 0.5 * (x + xold1)
                continue
            damp_count = 0
            Vol, dVol = constraint(x)
            if C0 is None:
                C0 = C
            f0val = C / C0
            df0dx = np.asarray(dC).reshape(-1, 1) / C0
            fval = np.array([[Vol]])
            dfdx = np.asarray(dVol).reshape(1, -1)

            xmin = np.maximum(x - 0.1, bounds[:, 0].reshape(-1, 1))
            xmax = np.minimum(x + 0.1, bounds[:, 1].reshape(-1, 1))

            xmma, *_, low, upp = mmasub(
                m, n, loop if np.size(low) or loop <= 2 else 2,
                x, xmin, xmax, xold1, xold2, f0val, df0dx, fval, dfdx,
                low, upp, obj_weight, lin_weight, slack_penalty, slack_quad)

            xold2 = xold1.copy()
            xold1 = x.copy()
            x = xmma
            ch = np.abs(np.mean(x.T - xold1.T) / np.mean(x.T))

            if on_iteration is not None:
                on_iteration({"loop": loop, "x": x, "xold1": xold1,
                              "xold2": xold2, "low": low, "upp": upp,
                              "C0": C0})
            self.logger.info(
                "iter %4d  obj=%1.3e  constr=%1.3e  step=%1.3e  "
                "compliance=%1.3e", loop, float(f0val),
                float(fval[0][0]), float(ch), float(C))
            if ch < options["deltaIt"]:
                self.logger.info("Convergence reached")
                break
            if loop == options["maxIt"]:
                self.logger.info("Max Iterations reached")
                break
        return x
